"""PointRCNN: point-wise RPN proposals + canonical RoI refinement
(loss + predict on synthetic inputs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


@pytest.fixture(scope='module')
def small_cfg():
    cfg = Config.fromfile('configs/point_rcnn/point_rcnn_kitti.py')
    m = cfg.model
    m.backbone.num_points = [128, 64, 32, 16]
    m.backbone.sa_channels = [[16, 16], [32, 32], [32, 32], [32, 32]]
    m.backbone.fp_channels = [[32, 32], [32, 32], [32, 16]]
    m.rpn_head.in_channels = 16
    m.rpn_head.cls_channels = [32]
    m.rpn_head.reg_channels = [32]
    m.rpn_head.nms_pre = 64
    m.rpn_head.max_num = 16
    m.roi_head.in_channels = 16
    m.roi_head.num_points = 16
    m.roi_head.mlp_channels = [32]
    m.roi_head.fc_channels = [32]
    return cfg


def test_point_rcnn_loss_and_predict(small_cfg):
    model = build_detector_from_cfg(small_cfg.model)
    batch = create_detector_inputs(batch_size=2, num_points=512, num_gt=4)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert {'rpn_loss_cls', 'rpn_loss_bbox', 'loss_rcnn_reg',
            'loss_rcnn_cls'} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)

    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape[:2] == (2, 16)
    assert np.isfinite(np.asarray(preds['bboxes'])).all()
