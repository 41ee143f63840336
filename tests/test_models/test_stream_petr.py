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


def test_streampetr_dn_focal_eva():
    """Denoising head + FocalHead priors + EVAViT backbone additions."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpu_bev3d.registry import MODELS

    B, N, iH, iW = 1, 2, 64, 96
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(B, N, iH, iW, 3)).astype(np.float32)
    # EVAViT backbone forward
    vit = MODELS.build(dict(type='EVAViT', img_size=(iH, iW),
                            patch_size=16, embed_dims=32, depth=3,
                            num_heads=2, window_size=2,
                            global_interval=3))
    vv = vit.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:, 0]))
    feats = vit.apply(vv, jnp.asarray(imgs[:, 0]))
    assert feats[0].shape == (B, iH // 16, iW // 16, 32)

    # DN head with focal priors
    head = MODELS.build(dict(type='StreamPETRHeadDN', num_classes=4,
                             in_channels=32, embed_dims=32, num_query=8,
                             num_layers=2, nhead=2, depth_num=4,
                             num_memory=4, num_dn_groups=2,
                             with_velocity=False))
    img_feats = jnp.asarray(
        rng.normal(size=(B, N, 4, 6, 32)).astype(np.float32))
    cam = dict(cam2lidar=jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))),
        intrins=jnp.asarray(np.tile(np.array(
            [[50., 0, 48], [0, 50., 32], [0, 0, 1]], np.float32),
            (B, N, 1, 1))))
    gtb = jnp.asarray(rng.uniform(-5, 5, (B, 3, 7)).astype(np.float32))
    gtl = jnp.asarray(rng.integers(0, 4, (B, 3)))
    gtm = jnp.ones((B, 3), bool)

    dn = head.make_dn(jax.random.PRNGKey(1), gtb, gtm)
    variables = head.init(jax.random.PRNGKey(0), img_feats, cam,
                          image_size=(iH, iW), dn=dn)
    outs = head.apply(variables, img_feats, cam, image_size=(iH, iW),
                      dn=dn)
    assert outs['dn_cls'].shape[2] == 6      # 2 groups x 3 GT
    assert outs['all_cls'].shape[2] == 8     # matching queries only
    dl = head.apply(variables, outs, gtb, gtl, gtm, method=head.dn_loss)
    for k, v in dl.items():
        assert np.isfinite(float(v)), (k, v)

    focal = MODELS.build(dict(type='FocalHead', num_classes=4,
                              in_channels=32, num_priors=8))
    fv = focal.init(jax.random.PRNGKey(0), img_feats, cam,
                    image_size=(iH, iW))
    refs, aux = focal.apply(fv, img_feats, cam, image_size=(iH, iW))
    assert refs.shape == (B, 8, 3)
    assert np.isfinite(np.asarray(refs)).all()


def test_stream_petr_scan_over_clip():
    """The fixed-size memory pytree makes the streaming step scannable:
    lax.scan over a 3-frame clip with memory carry (the docstring's
    contract; GroupStreamingSampler analogue feeds frames in order)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    model = build_detector_from_cfg(_cfg())
    batch = create_multimodal_inputs(batch_size=1, num_points=32,
                                     image_size=(64, 176), num_cams=2,
                                     pc_range=(-51.2, -51.2, -5.0,
                                               51.2, 51.2, 3.0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')

    T = 3
    rng = np.random.default_rng(1)
    clip_imgs = jnp.asarray(rng.normal(
        size=(T,) + batch['imgs'].shape).astype(np.float32))

    def step(memory, imgs_t):
        b = dict(batch, imgs=imgs_t)
        preds, new_mem = model.apply(variables, b, memory=memory,
                                     mode='predict')
        return new_mem, preds['scores']

    mem0 = jax.tree_util.tree_map(
        jnp.asarray, model.apply(variables, 1,
                                 method=lambda m, B: m.empty_memory(B)))
    final_mem, scores = jax.jit(
        lambda m0, c: jax.lax.scan(step, m0, c))(mem0, clip_imgs)
    assert scores.shape[0] == T
    assert np.all(np.isfinite(np.asarray(scores)))
    # memory evolved: later frames see different propagated queries
    assert not np.allclose(np.asarray(scores[0]), np.asarray(scores[-1]))
