"""End-to-end CenterPoint (SparseEncoder + CenterHead) on synthetic inputs,
small shapes for CPU CI. Pattern: ref tests/test_models/test_detectors/
test_center_point.py."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


@pytest.fixture(scope='module')
def small_cfg():
    cfg = Config.fromfile(
        'configs/centerpoint/centerpoint_voxel01_second_secfpn_nus.py')
    m = cfg.model
    m.voxel_size = [0.8, 0.8, 0.2]
    m.max_voxels = 1024
    m.max_num_points = 5
    m.middle_encoder.sparse_shape = [41, 128, 128]
    m.bbox_head.voxel_size = [0.8, 0.8]
    m.bbox_head.grid_size = [128, 128]
    m.bbox_head.max_objs = 10
    m.bbox_head.post_max_size = 8
    return cfg


def test_centerpoint_loss_and_predict(small_cfg):
    model = build_detector_from_cfg(small_cfg.model)
    batch = create_detector_inputs(
        batch_size=1, num_points=256, point_dim=5, num_gt=4, num_classes=10,
        pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0), with_velocity=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert any('loss_heatmap' in k for k in losses)
    assert any('loss_bbox' in k for k in losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'

    preds = model.apply(variables, batch, mode='predict')
    # 6 tasks × post_max_size
    assert preds['bboxes'].shape == (1, 6 * 8, 9)
    assert preds['scores'].shape == (1, 6 * 8)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
    lab = np.asarray(preds['labels'])
    assert lab.min() >= 0 and lab.max() < 10
