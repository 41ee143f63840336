"""PV-RCNN: VoxelSetAbstraction keypoints + grid-pool RoI refinement
(loss + predict on synthetic inputs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


@pytest.fixture(scope='module')
def small_cfg():
    cfg = Config.fromfile('configs/pv_rcnn/pv_rcnn_kitti.py')
    m = cfg.model
    m.voxel_size = [0.55, 0.625, 0.0976]
    m.max_voxels = 512
    m.max_num_points = 4
    me = m.middle_encoder
    me.sparse_shape = [41, 128, 128]
    me.base_channels = 8
    me.output_channels = 16
    me.encoder_channels = [[8], [16, 16], [16, 16], [16, 16]]
    me.encoder_paddings = [[1], [1, 1], [1, 1], [[0, 1, 1], 1]]
    m.backbone.in_channels = 32
    m.backbone.layer_nums = [2, 2]
    m.backbone.out_channels = [32, 64]
    m.neck.in_channels = [32, 64]
    m.neck.out_channels = [32, 32]
    m.rpn_head.in_channels = 64
    m.rpn_head.feat_channels = 64
    m.rpn_head.nms_pre = 64
    m.rpn_head.max_num = 16
    pe = m.points_encoder
    pe.num_keypoints = 64
    pe.voxel_size = m.voxel_size
    pe.rawpoints_mlps = [[8, 8], [8, 8]]
    pe.voxel_sa_cfgs = [
        dict(stage=0, factor=1, radii=[0.8, 1.6], samples=[8, 8],
             mlps=[[8, 8], [8, 8]]),
        dict(stage=2, factor=4, radii=[3.2, 6.4], samples=[8, 8],
             mlps=[[16, 16], [16, 16]])]
    m.roi_head.grid_size = 3
    m.roi_head.radii = [1.6, 3.2]
    m.roi_head.num_samples = [8, 8]
    m.roi_head.mlp_channels = [[16, 16], [16, 16]]
    m.roi_head.fc_channels = [32]
    return cfg


def test_pv_rcnn_loss_and_predict(small_cfg):
    model = build_detector_from_cfg(small_cfg.model)
    batch = create_detector_inputs(batch_size=2, num_points=512, num_gt=4)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert {'rpn_loss_cls', 'rpn_loss_bbox', 'loss_rcnn_reg',
            'loss_rcnn_cls', 'loss_keypoint_seg'} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)

    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape[:2] == (2, 16)
    assert np.isfinite(np.asarray(preds['bboxes'])).all()
