"""SECOND (sparse encoder + anchor head) and DynamicVoxelNet (DynamicVFE)
end-to-end on tiny shapes; inference API smoke test."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


def test_second_loss_and_predict():
    cfg = Config.fromfile('configs/second/second_kitti_3class.py')
    m = cfg.model
    m.voxel_size = [0.44, 0.44, 0.1]  # 160x176x40 grid (div by 8)
    m.max_voxels = 512
    m.middle_encoder.sparse_shape = [41, 176, 160]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 8
    model = build_detector_from_cfg(m)
    batch = create_detector_inputs(batch_size=1, num_points=256, num_gt=4,
                                   pc_range=(0, -40, -3, 70.4, 40, 1))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (1, 8, 7)


def test_dynamic_voxelnet():
    cfg = Config.fromfile(
        'configs/pointpillars/pointpillars_dyn_kitti_3class.py')
    m = cfg.model
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 256
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    m.middle_encoder.output_shape = [128, 112]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 8
    model = build_detector_from_cfg(m)
    batch = create_detector_inputs(batch_size=2, num_points=256, num_gt=4)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (2, 8, 7)


def test_inference_api(tmp_path):
    from tpu_bev3d.apis import init_model, inference_detector
    cfg = Config.fromfile('configs/pointpillars/pointpillars_kitti_3class.py')
    m = cfg.model
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 256
    m.max_num_points = 8
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    m.middle_encoder.output_shape = [128, 112]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 8
    cfg['inference_num_points'] = 512
    model = init_model(cfg)
    pts = np.random.default_rng(0).uniform(
        [0, -40, -3, 0], [70, 40, 1, 1], (300, 4)).astype(np.float32)
    res = inference_detector(model, pts)
    assert len(res) == 1
    assert res[0]['bboxes'].ndim == 2
    # file path input
    p = tmp_path / 'cloud.bin'
    pts.tofile(p)
    res2 = inference_detector(model, str(p))
    assert np.allclose(res2[0]['bboxes'], res[0]['bboxes'])


def test_lidar_inferencer(tmp_path):
    from tpu_bev3d.apis import LidarDet3DInferencer
    cfg = Config.fromfile('configs/pointpillars/pointpillars_kitti_3class.py')
    m = cfg.model
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 256
    m.max_num_points = 8
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    m.middle_encoder.output_shape = [128, 112]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 8
    cfg['inference_num_points'] = 512
    inf = LidarDet3DInferencer(__import__('tpu_bev3d.apis',
                                          fromlist=['init_model'])
                               .init_model(cfg))
    pts = np.random.default_rng(0).uniform(
        [0, -40, -3, 0], [70, 40, 1, 1], (300, 4)).astype(np.float32)
    out = inf(pts, out_dir=str(tmp_path), score_thr=0.0)
    assert 'predictions' in out and len(out['predictions']) == 1
    import os
    assert os.path.exists(tmp_path / 'vis_0.png')


def test_pointpillars_nus_velocity_boxes():
    cfg = Config.fromfile('configs/pointpillars/pointpillars_nus.py')
    m = cfg.model
    m.voxel_size = [1.0, 1.0, 8]
    m.max_voxels = 256
    m.max_num_points = 8
    m.voxel_encoder.voxel_size = [1.0, 1.0, 8]
    m.middle_encoder.output_shape = [104, 104]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 16
    model = build_detector_from_cfg(m)
    batch = create_detector_inputs(
        batch_size=1, num_points=256, num_gt=4, num_classes=10,
        pc_range=(-50, -50, -5, 50, 50, 3), with_velocity=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (1, 16, 9)


def test_sassd_aux_losses():
    cfg = Config.fromfile('configs/pointpillars/pointpillars_kitti_3class.py')
    m = cfg.model
    m.type = 'SASSD'
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 256
    m.max_num_points = 8
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    m.middle_encoder.output_shape = [128, 112]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 8
    model = build_detector_from_cfg(m)
    batch = create_detector_inputs(batch_size=1, num_points=256, num_gt=4)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert 'aux_loss_fg' in losses and 'aux_loss_center' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
