"""FCAF3D sparse anchor-free indoor detector on tiny shapes (B=1)."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.testing import build_detector_from_cfg


def test_fcaf3d():
    cfg = dict(
        type='MinkSingleStage3DDetector',
        voxel_size=[0.32, 0.32, 0.32],
        point_cloud_range=[-6.4, -6.4, -2.56, 6.4, 6.4, 2.56],
        max_voxels=512,
        backbone=dict(
            type='MinkUNetBackbone', in_channels=4, base_channels=8,
            encoder_channels=[8, 16, 16], encoder_blocks=[1, 1, 1],
            decoder_channels=[16, 16, 16], decoder_blocks=[1, 1, 1]),
        bbox_head=dict(
            type='FCAF3DHead', num_classes=5, in_channels=16,
            voxel_size=[0.32, 0.32, 0.32],
            pc_range=[-6.4, -6.4, -2.56, 6.4, 6.4, 2.56],
            max_num=16))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B, P, G = 1, 256, 4
    pts = rng.uniform([-6, -6, -2, 0], [6, 6, 2, 1],
                      (B, P, 4)).astype(np.float32)
    ctr = rng.uniform(-4, 4, (B, G, 3))
    dims = rng.uniform(0.5, 2.5, (B, G, 3))
    yaw = np.zeros((B, G, 1))
    gtb = np.concatenate([ctr, dims, yaw], -1).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool),
                 gt_bboxes_3d=jnp.asarray(gtb),
                 gt_labels_3d=jnp.asarray(rng.integers(0, 5, (B, G))),
                 gt_mask=jnp.ones((B, G), bool))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses = model.apply(variables, batch, mode='loss')
    assert {'loss_cls', 'loss_bbox', 'loss_centerness'} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (1, 16, 7)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
