"""StreamPETR: streaming steps carry fixed-size query memory across
frames; memory influences the next frame's predictions."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.testing import (build_detector_from_cfg,
                               create_multimodal_inputs)


def _cfg():
    return dict(
        type='StreamPETR',
        image_size=[64, 176],
        num_propagated=8,
        img_backbone=dict(
            type='SwinTransformer', embed_dims=32, depths=[2, 2, 2],
            num_heads=[2, 4, 8], window_size=7, out_indices=[0, 1, 2]),
        img_neck=dict(
            type='GeneralizedLSSFPN', in_channels=[32, 64, 128],
            out_channels=64, num_outs=2),
        bbox_head=dict(
            type='StreamPETRHead', num_classes=10, in_channels=64,
            embed_dims=64, num_query=16, num_layers=2, depth_num=8,
            max_num=8,
            pc_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]))


def test_stream_petr_memory_propagation():
    model = build_detector_from_cfg(_cfg())
    batch = create_multimodal_inputs(batch_size=1, num_points=32,
                                     image_size=(64, 176), num_cams=2,
                                     pc_range=(-51.2, -51.2, -5.0,
                                               51.2, 51.2, 3.0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch['ego_motion'] = jnp.eye(4)[None]
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')

    # frame 1: empty memory
    (losses, mem1), _ = model.apply(variables, batch, mode='loss',
                                    train=True, mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert mem1['feat'].shape == (1, 8, 64)
    assert mem1['ref'].shape == (1, 8, 3)

    # frame 2: memory in → predictions differ from memory-less run
    preds2, mem2 = model.apply(variables, batch, memory=mem1,
                               mode='predict')
    preds2_nomem, _ = model.apply(variables, batch, mode='predict')
    assert preds2['bboxes'].shape == (1, 8, 9)
    assert not np.allclose(np.asarray(preds2['scores']),
                           np.asarray(preds2_nomem['scores']))
    assert np.all(np.isfinite(np.asarray(preds2['bboxes'])))
