"""End-to-end PointPillars: init → loss mode → predict mode on synthetic
inputs (pattern from ref tests/test_models/test_detectors/
test_center_point.py:11-50, small shapes for CPU CI)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


@pytest.fixture(scope='module')
def small_cfg():
    cfg = Config.fromfile('configs/pointpillars/pointpillars_kitti_3class.py')
    m = cfg.model
    # shrink for CPU: coarse voxels, small capacities
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 512
    m.max_num_points = 8
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    # divisible by 8 so the three stride-2 stages + deconvs re-align
    m.middle_encoder.output_shape = [128, 112]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 16
    return cfg


def test_pointpillars_loss_and_predict(small_cfg):
    model = build_detector_from_cfg(small_cfg.model)
    batch = create_detector_inputs(batch_size=2, num_points=256, num_gt=5)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor',
                           train=False)
    assert 'params' in variables

    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
        assert float(v) >= 0, f'{k} negative'

    preds = model.apply(variables, batch, mode='predict', train=False)
    assert preds['bboxes'].shape == (2, 16, 7)
    assert preds['scores'].shape == (2, 16)
    assert preds['labels'].shape == (2, 16)
    assert preds['mask'].shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))


def test_pointpillars_tensor_mode_shapes(small_cfg):
    model = build_detector_from_cfg(small_cfg.model)
    batch = create_detector_inputs(batch_size=1, num_points=128, num_gt=3)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    cls, reg, dirp = model.apply(variables, batch, mode='tensor')
    H, W = 64, 56  # canvas/2
    assert cls.shape == (1, H, W, 6 * 3)
    assert reg.shape == (1, H, W, 6 * 7)
    assert dirp.shape == (1, H, W, 6 * 2)
