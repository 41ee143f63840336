"""Full PGD head: probabilistic depth bins + fusion, 2D branch +
consistency (on the FCOSMono3D detector shell)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_bev3d.testing import build_detector_from_cfg


def test_pgd_full_head():
    cfg = dict(
        type='FCOSMono3D',
        img_backbone=dict(type='SwinTransformer', embed_dims=32,
                          depths=[2, 2], num_heads=[2, 4], window_size=7,
                          out_indices=[0, 1]),
        img_neck=dict(type='GeneralizedLSSFPN', in_channels=[32, 64],
                      out_channels=32, num_outs=1),
        bbox_head=dict(type='PGDHead', num_classes=3, in_channels=32,
                       feat_channels=32, stacked_convs=1, strides=[4],
                       num_depth_bins=8, max_num=16))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B, G = 1, 4
    imgs = rng.normal(size=(B, 96, 128, 3)).astype(np.float32)
    cam2img = np.tile(np.array(
        [[100., 0, 64], [0, 100., 48], [0, 0, 1]], np.float32), (B, 1, 1))
    ctr = np.stack([rng.uniform(-3, 3, (B, G)), rng.uniform(-1, 1, (B, G)),
                    rng.uniform(5, 25, (B, G))], -1)
    gtb = np.concatenate(
        [ctr, rng.uniform(0.5, 3, (B, G, 3)),
         rng.uniform(-np.pi, np.pi, (B, G, 1))], -1).astype(np.float32)
    batch = dict(imgs=jnp.asarray(imgs), cam2img=jnp.asarray(cam2img),
                 gt_bboxes_3d=jnp.asarray(gtb),
                 gt_labels_3d=jnp.asarray(rng.integers(0, 3, (B, G))),
                 gt_mask=jnp.ones((B, G), bool))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert {'loss_cls', 'loss_depth', 'loss_depth_prob', 'loss_bbox2d',
            'loss_consistency'} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    preds = model.apply(variables, batch, mode='predict')
    assert np.isfinite(np.asarray(preds['bboxes'])).all()
