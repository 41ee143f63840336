"""VoteNet end-to-end on tiny shapes (indoor point-based path:
PointNet2SASSG + VoteHead)."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


def test_votenet_loss_and_predict():
    cfg = Config.fromfile('configs/votenet/votenet_sunrgbd.py')
    m = cfg.model
    m.backbone.num_points = (64, 32, 16, 8)
    m.backbone.num_samples = (8, 8, 4, 4)
    m.backbone.sa_channels = ((16, 16), (16, 16), (16, 16), (16, 16))
    m.backbone.fp_channels = ((16, 16), (16, 16))
    m.bbox_head.in_channels = 16
    m.bbox_head.num_proposals = 8
    m.bbox_head.agg_channels = (16, 16)
    m.bbox_head.agg_num_sample = 4
    m.bbox_head.max_num = 8
    model = build_detector_from_cfg(m)
    batch = create_detector_inputs(batch_size=2, num_points=128, num_gt=3,
                                   num_classes=10,
                                   pc_range=(-4, -4, -2, 4, 4, 2))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses = model.apply(variables, batch, mode='loss')
    assert {'vote_loss', 'objectness_loss', 'center_loss',
            'semantic_loss'} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (2, 8, 7)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))


def test_votenet_tpu_fast_bucketed_fps_predict():
    """tpu_fast variant: bucketed FPS through backbone + vote aggregation
    (configs/votenet/votenet_scannet_tpu_fast.py knob)."""
    cfg = Config.fromfile('configs/votenet/votenet_sunrgbd.py')
    m = cfg.model
    m.backbone.num_points = (64, 32, 16, 8)
    m.backbone.num_samples = (8, 8, 4, 4)
    m.backbone.sa_channels = ((16, 16), (16, 16), (16, 16), (16, 16))
    m.backbone.fp_channels = ((16, 16), (16, 16))
    m.backbone.fps_chunks = 8
    m.bbox_head.in_channels = 16
    m.bbox_head.num_proposals = 8
    m.bbox_head.agg_channels = (16, 16)
    m.bbox_head.agg_num_sample = 4
    m.bbox_head.max_num = 8
    m.bbox_head.fps_chunks = 8
    model = build_detector_from_cfg(m)
    batch = create_detector_inputs(batch_size=2, num_points=128, num_gt=3,
                                   num_classes=10,
                                   pc_range=(-4, -4, -2, 4, 4, 2))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses = model.apply(variables, batch, mode='loss')
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (2, 8, 7)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
