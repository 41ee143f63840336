"""Two-stage detector: CenterPoint RPN + BEV RoI refinement."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


def test_two_stage_refine():
    base = Config.fromfile(
        'configs/centerpoint/centerpoint_voxel01_second_secfpn_nus.py')
    m = base.model
    m.type = 'TwoStage3DDetector'
    m.voxel_size = [0.8, 0.8, 0.2]
    m.max_voxels = 512
    m.max_num_points = 5
    m.middle_encoder.sparse_shape = [41, 128, 128]
    m.bbox_head.voxel_size = [0.8, 0.8]
    m.bbox_head.grid_size = [128, 128]
    m.bbox_head.max_objs = 8
    m.bbox_head.post_max_size = 8
    m.roi_head = dict(
        type='BEVGridRoIHead', in_channels=512, grid_size=4,
        mlp_channels=(32, 32),
        point_cloud_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0])
    model = build_detector_from_cfg(m)
    batch = create_detector_inputs(
        batch_size=1, num_points=256, point_dim=5, num_gt=4,
        num_classes=10, pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        with_velocity=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert 'loss_rcnn_reg' in losses and 'loss_rcnn_iou' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (1, 6 * 8, 9)
    assert not any(k.startswith('_') for k in preds)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
