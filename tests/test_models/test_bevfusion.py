"""End-to-end BEVFusion: lidar-only and lidar+camera fused paths on tiny
shapes (CPU CI). The fused test exercises Swin → GeneralizedLSSFPN →
DepthLSSTransform → bev_pool → ConvFuser → SECOND/FPN → BEVFusionHead."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import (build_detector_from_cfg,
                               create_multimodal_inputs)


def _tiny_lidar(m):
    m.voxel_size = [0.5625, 0.5625, 0.2]
    m.max_voxels = 1024
    m.middle_encoder.sparse_shape = [41, 192, 192]
    m.bbox_head.voxel_size = [0.5625, 0.5625, 0.2]
    m.bbox_head.num_proposals = 32


@pytest.fixture(scope='module')
def lidar_cfg():
    cfg = Config.fromfile(
        'configs/bevfusion/bevfusion_lidar_voxel0075_second_secfpn_nus.py')
    _tiny_lidar(cfg.model)
    return cfg


@pytest.fixture(scope='module')
def fused_cfg():
    cfg = Config.fromfile(
        'configs/bevfusion/'
        'bevfusion_lidar_cam_voxel0075_second_secfpn_nus.py')
    m = cfg.model
    _tiny_lidar(m)
    m.view_transform.image_size = [64, 176]
    m.view_transform.feature_size = [8, 22]
    m.view_transform.xbound = [-54.0, 54.0, 2.25]
    m.view_transform.ybound = [-54.0, 54.0, 2.25]
    m.view_transform.dbound = [1.0, 25.0, 1.0]
    return cfg


def test_bevfusion_lidar_only(lidar_cfg):
    model = build_detector_from_cfg(lidar_cfg.model)
    batch = create_multimodal_inputs(batch_size=1, num_points=512)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k not in ('imgs', 'intrins', 'cam2lidar', 'lidar2img',
                          'post_rots', 'post_trans')}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert set(losses) >= {'loss_heatmap', 'loss_cls', 'loss_bbox'}
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (1, 32, 9)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))


def test_bevfusion_lidar_cam(fused_cfg):
    model = build_detector_from_cfg(fused_cfg.model)
    batch = create_multimodal_inputs(batch_size=1, num_points=512,
                                     image_size=(64, 176))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert 'loss_depth' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (1, 32, 9)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
