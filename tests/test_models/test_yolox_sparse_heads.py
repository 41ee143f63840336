"""StreamPETR aux 2D YOLOX head (SimOTA) + fully-sparse SparseHead."""
import numpy as np

import jax
import jax.numpy as jnp

import tpu_bev3d.models  # noqa: F401 — trigger registration
from tpu_bev3d.registry import MODELS
from tpu_bev3d.testing import (build_detector_from_cfg,
                               create_multimodal_inputs)


def test_simota_assign_prefers_overlapping_prior():
    """A prior centered on the GT with a perfectly matching decoded box
    must be assigned foreground; distant priors stay background."""
    from tpu_bev3d.models.dense_heads.yolox_head import simota_assign
    P, G, C = 64, 4, 3
    rng = np.random.default_rng(0)
    xs = np.linspace(4, 252, 8)
    cx, cy = np.meshgrid(xs, xs)
    priors = np.stack([cx.ravel(), cy.ravel(),
                       np.full(P, 8.0), np.full(P, 8.0)], -1)
    gt = np.array([[0., 0., 40., 40.]] * G, np.float32)
    gt_mask = np.array([True] + [False] * (G - 1))
    gt_labels = np.zeros(G, np.int64)
    decoded = np.tile(priors[:, :2], (1, 2)) + np.array([-16, -16, 16, 16])
    cls_prob = np.full((P, C), 0.5, np.float32)
    obj_prob = np.full((P,), 0.5, np.float32)
    fg, mgt, miou = jax.jit(
        lambda *a: simota_assign(*a, num_classes=C))(
        jnp.asarray(cls_prob), jnp.asarray(obj_prob),
        jnp.asarray(priors, jnp.float32), jnp.asarray(decoded,
                                                      jnp.float32),
        jnp.asarray(gt), jnp.asarray(gt_labels), jnp.asarray(gt_mask))
    fg = np.asarray(fg)
    assert fg.sum() >= 1
    # every fg prior sits inside the only valid GT box
    assert np.all(priors[fg, 0] <= 40 + 2.5 * 8)
    assert np.all(priors[fg, 1] <= 40 + 2.5 * 8)
    assert np.all(np.asarray(mgt)[fg] == 0)


def test_yolox2d_forward_loss_and_priors():
    head = MODELS.build(dict(type='YOLOXHead2D', num_classes=4,
                             in_channels=32, feat_channels=32,
                             stacked_convs=1, strides=(8, 16)))
    BN, C = 2, 32
    feats = [jnp.asarray(np.random.default_rng(0).normal(
        size=(BN, 16, 24, C)).astype(np.float32)),
        jnp.asarray(np.random.default_rng(1).normal(
            size=(BN, 8, 12, C)).astype(np.float32))]
    variables = head.init(jax.random.PRNGKey(0), feats, train=False)
    outs = head.apply(variables, feats, train=False)
    P = 16 * 24 + 8 * 12
    assert outs['cls'].shape == (BN, P, 4)
    assert outs['bboxes'].shape == (BN, P, 4)
    assert outs['centers2d'].shape == (BN, P, 2)

    G = 3
    gtb = jnp.asarray([[[10., 10., 60., 60.], [100., 40., 150., 90.],
                        [0., 0., 0., 0.]]] * BN)
    gtl = jnp.zeros((BN, G), jnp.int32)
    c2d = (gtb[..., :2] + gtb[..., 2:]) / 2
    gtm = jnp.asarray([[True, True, False]] * BN)
    losses = jax.jit(lambda v, o: head.apply(
        v, o, gtb, gtl, c2d, gtm, method=head.loss_by_feat))(variables,
                                                             outs)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses['enc_loss_obj']) > 0

    ctr, top, idx = head.apply(variables, outs, 8, method=head.top_priors)
    assert ctr.shape == (BN, 8, 2)


def test_sparse_head_temporal_alignment():
    """SparseHead consumes the extended memory (velo/timestamp/egopose)
    and MLN conditioning changes predictions when the memory ages."""
    B, N, fH, fW, C = 1, 2, 4, 6, 32
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, N, fH, fW, C))
                        .astype(np.float32))
    cam = dict(
        cam2lidar=jnp.tile(jnp.eye(4)[None, None], (B, N, 1, 1)),
        intrins=jnp.tile(jnp.asarray(
            [[100., 0, 48], [0, 100., 32], [0, 0, 1]])[None, None],
            (B, N, 1, 1)))
    head = MODELS.build(dict(type='SparseHead', num_classes=4,
                             embed_dims=32, num_query=8, num_layers=2,
                             nhead=2, depth_num=4, num_memory=4,
                             max_num=8,
                             image_size=(64, 96)))
    M = 4
    mem = dict(feat=jnp.asarray(rng.normal(size=(B, M, 32))
                                .astype(np.float32)),
               ref=jnp.full((B, M, 3), 0.4),
               valid=jnp.ones((B, M), bool),
               velo=jnp.zeros((B, M, 3)),
               timestamp=jnp.zeros((B, M, 1)),
               egopose=jnp.tile(jnp.eye(4), (B, M, 1, 1)))
    variables = head.init(jax.random.PRNGKey(0), feats, cam, memory=mem)
    outs = head.apply(variables, feats, cam, memory=mem)
    Q = 8 + M
    assert outs['all_cls'].shape == (2, B, Q, 4)
    assert outs['all_bbox'].shape == (2, B, Q, 10)

    aged = dict(mem, timestamp=jnp.full((B, M, 1), 0.5),
                velo=jnp.full((B, M, 3), 2.0))
    outs2 = head.apply(variables, feats, cam, memory=aged)
    assert not np.allclose(np.asarray(outs['all_cls']),
                           np.asarray(outs2['all_cls']))

    # prior refs extend the query set
    priors = jnp.full((B, 6, 3), 0.5)
    outs3 = head.apply(variables, feats, cam, memory=mem,
                       prior_refs=priors)
    assert outs3['all_cls'].shape == (2, B, Q + 6, 4)

    # loss + predict delegate to the PETR parameterization
    G = 5
    gtb = jnp.asarray(rng.uniform(-10, 10, (B, G, 9)).astype(np.float32))
    gtb = gtb.at[..., 3:6].set(jnp.abs(gtb[..., 3:6]) + 1)
    losses = head.apply(variables, outs, gtb,
                        jnp.zeros((B, G), jnp.int32),
                        jnp.ones((B, G), bool),
                        method=head.loss_by_feat)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = head.apply(variables, outs, method=head.predict_by_feat)
    assert preds['bboxes'].shape[-1] == 9


def test_streampetr_with_yolox_aux_and_sparse_head():
    """End-to-end: StreamPETR detector with SparseHead + YOLOX 2D aux
    losses from per-camera 2D GT."""
    cfg = dict(
        type='StreamPETR',
        image_size=[64, 96],
        num_propagated=4,
        img_backbone=dict(
            type='SwinTransformer', embed_dims=32, depths=[2, 2],
            num_heads=[2, 4], window_size=7, out_indices=[0, 1]),
        img_neck=dict(
            type='GeneralizedLSSFPN', in_channels=[32, 64],
            out_channels=32, num_outs=2),
        img_roi_head=dict(
            type='YOLOXHead2D', num_classes=10, in_channels=32,
            feat_channels=32, stacked_convs=1, strides=(4, 8)),
        bbox_head=dict(
            type='SparseHead', num_classes=10, embed_dims=32,
            num_query=8, num_layers=2, nhead=2, depth_num=4, max_num=8,
            image_size=(64, 96),
            pc_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]))
    model = build_detector_from_cfg(cfg)
    batch = create_multimodal_inputs(batch_size=1, num_points=32,
                                     image_size=(64, 96), num_cams=2,
                                     pc_range=(-51.2, -51.2, -5.0,
                                               51.2, 51.2, 3.0),
                                     with_2d_gt=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch['time_delta'] = jnp.full((1,), 0.5)
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    (losses, mem), _ = model.apply(variables, batch, mode='loss',
                                   train=True, mutable=['batch_stats'])
    assert 'enc_loss_cls' in losses          # aux 2D losses present
    assert 'loss_cls' in losses              # 3D losses present
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert mem['velo'].shape == (1, 4, 3)
    assert mem['timestamp'].shape == (1, 4, 1)

    # second frame consumes the aged memory
    preds, _ = model.apply(variables, batch, memory=mem, mode='predict')
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))


def test_eva_rope_properties():
    """Axial 2D RoPE: rotation preserves norms, and q·k depends only on
    the RELATIVE offset (the property that makes grid-level application
    equivalent to window-relative application)."""
    from tpu_bev3d.models.detectors.stream_petr import (apply_rope,
                                                        rope_2d_tables)
    h, w, d = 8, 10, 16
    cos, sin = rope_2d_tables(h, w, d)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, h, w, 2, d)).astype(np.float32))
    qr = apply_rope(q, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(qr), axis=-1),
                               np.linalg.norm(np.asarray(q), axis=-1),
                               rtol=1e-5)
    # relative invariance: score between positions p and p+delta is the
    # same wherever p sits
    v1 = np.asarray(rng.normal(size=(d,)).astype(np.float32))
    v2 = np.asarray(rng.normal(size=(d,)).astype(np.float32))
    base = jnp.zeros((1, h, w, 1, d))
    a = np.asarray(apply_rope(base.at[0, 1, 1, 0].set(v1), cos, sin))
    b = np.asarray(apply_rope(base.at[0, 3, 4, 0].set(v2), cos, sin))
    s1 = a[0, 1, 1, 0] @ b[0, 3, 4, 0]          # offset (2, 3)
    a2 = np.asarray(apply_rope(base.at[0, 4, 2, 0].set(v1), cos, sin))
    b2 = np.asarray(apply_rope(base.at[0, 6, 5, 0].set(v2), cos, sin))
    s2 = a2[0, 4, 2, 0] @ b2[0, 6, 5, 0]        # same offset (2, 3)
    assert abs(s1 - s2) < 1e-4, (s1, s2)
