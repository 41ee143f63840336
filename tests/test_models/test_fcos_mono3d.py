"""FCOS3D mono detector end-to-end on tiny shapes."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.testing import build_detector_from_cfg


def test_fcos_mono3d():
    cfg = dict(
        type='FCOSMono3D',
        img_backbone=dict(
            type='SwinTransformer', embed_dims=32, depths=[2, 2, 2],
            num_heads=[2, 4, 8], window_size=7, out_indices=[0, 1, 2]),
        img_neck=dict(
            type='GeneralizedLSSFPN', in_channels=[32, 64, 128],
            out_channels=64, num_outs=2),
        bbox_head=dict(
            type='FCOSMono3DHead', num_classes=3, in_channels=64,
            feat_channels=32, stacked_convs=1, strides=[8, 16],
            max_num=16))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B, G = 2, 4
    imgs = rng.normal(size=(B, 96, 128, 3)).astype(np.float32)
    cam2img = np.tile(np.array(
        [[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], np.float32),
        (B, 1, 1))
    # camera-frame boxes: x right, y down, z forward (depth 4-20m)
    ctr = np.stack([rng.uniform(-3, 3, (B, G)), rng.uniform(-1, 1, (B, G)),
                    rng.uniform(4, 20, (B, G))], -1)
    dims = rng.uniform(0.5, 3, (B, G, 3))
    yaw = rng.uniform(-np.pi, np.pi, (B, G, 1))
    gtb = np.concatenate([ctr, dims, yaw], -1).astype(np.float32)
    batch = dict(imgs=jnp.asarray(imgs), cam2img=jnp.asarray(cam2img),
                 gt_bboxes_3d=jnp.asarray(gtb),
                 gt_labels_3d=jnp.asarray(rng.integers(0, 3, (B, G))),
                 gt_mask=jnp.ones((B, G), bool))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert {'loss_cls', 'loss_bbox', 'loss_centerness'} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (B, 16, 7)
    assert np.all(np.asarray(preds['bboxes'][..., 2]) >= 0)  # depth > 0


def test_pgd_depth_uncertainty():
    cfg = dict(
        type='FCOSMono3D',
        img_backbone=dict(
            type='SwinTransformer', embed_dims=32, depths=[2, 2, 2],
            num_heads=[2, 4, 8], window_size=7, out_indices=[0, 1, 2]),
        img_neck=dict(
            type='GeneralizedLSSFPN', in_channels=[32, 64, 128],
            out_channels=64, num_outs=2),
        bbox_head=dict(
            type='FCOSMono3DHead', num_classes=3, in_channels=64,
            feat_channels=32, stacked_convs=1, strides=[8, 16],
            depth_uncertainty=True, max_num=16))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(1)
    B, G = 1, 3
    imgs = rng.normal(size=(B, 96, 128, 3)).astype(np.float32)
    cam2img = np.tile(np.array(
        [[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], np.float32),
        (B, 1, 1))
    ctr = np.stack([rng.uniform(-3, 3, (B, G)), rng.uniform(-1, 1, (B, G)),
                    rng.uniform(4, 20, (B, G))], -1)
    gtb = np.concatenate([ctr, rng.uniform(0.5, 3, (B, G, 3)),
                          rng.uniform(-np.pi, np.pi, (B, G, 1))],
                         -1).astype(np.float32)
    batch = dict(imgs=jnp.asarray(imgs), cam2img=jnp.asarray(cam2img),
                 gt_bboxes_3d=jnp.asarray(gtb),
                 gt_labels_3d=jnp.asarray(rng.integers(0, 3, (B, G))),
                 gt_mask=jnp.ones((B, G), bool))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert 'loss_depth' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
