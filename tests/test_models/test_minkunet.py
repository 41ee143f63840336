"""MinkUNet sparse segmentor end-to-end + SegMetric."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.testing import build_detector_from_cfg


def test_minkunet_seg():
    cfg = dict(
        type='MinkUNet',
        num_classes=5,
        voxel_size=[0.8, 0.8, 0.4],
        point_cloud_range=[-12.8, -12.8, -3.2, 12.8, 12.8, 3.2],
        max_voxels=512,
        backbone=dict(
            type='MinkUNetBackbone',
            in_channels=4,
            base_channels=8,
            encoder_channels=[8, 16, 32, 32],
            encoder_blocks=[1, 1, 1, 1],
            decoder_channels=[32, 16, 16, 16],
            decoder_blocks=[1, 1, 1, 1]))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B, P = 2, 256
    pts = rng.uniform([-12, -12, -3, 0], [12, 12, 3, 1],
                      (B, P, 4)).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool),
                 pts_semantic_mask=jnp.asarray(
                     rng.integers(0, 5, (B, P)), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses = model.apply(variables, batch, mode='loss')
    assert np.isfinite(float(losses['loss_sem_seg']))
    preds = model.apply(variables, batch, mode='predict')
    assert preds['pts_semantic_mask'].shape == (B, P)

    from tpu_bev3d.evaluation import SegMetric
    m = SegMetric(classes=['a', 'b', 'c', 'd', 'e'])
    m.process({k: np.asarray(v) for k, v in preds.items()},
              {k: np.asarray(v) for k, v in batch.items()})
    out = m.compute_metrics()
    assert 0.0 <= out['miou'] <= 1.0
    # perfect predictions → miou 1
    m2 = SegMetric(classes=['a', 'b', 'c', 'd', 'e'])
    m2.process(dict(pts_semantic_mask=batch['pts_semantic_mask'],
                    mask=np.ones((B, P), bool)),
               dict(pts_semantic_mask=batch['pts_semantic_mask']))
    assert m2.compute_metrics()['miou'] == 1.0


def test_minkunet_stage_capacities_exact():
    """Ample per-stage capacities change only the padded table sizes:
    point predictions must match the legacy full-capacity graph exactly
    (the flat strided conv assigns output slots in linear-id order, so a
    capacity that covers every active site is a pure relayout)."""
    base = dict(
        type='MinkUNet',
        num_classes=5,
        voxel_size=[0.8, 0.8, 0.4],
        point_cloud_range=[-12.8, -12.8, -3.2, 12.8, 12.8, 3.2],
        max_voxels=512,
        backbone=dict(
            type='MinkUNetBackbone',
            in_channels=4,
            base_channels=8,
            encoder_channels=[8, 16, 32, 32],
            encoder_blocks=[1, 1, 1, 1],
            decoder_channels=[32, 16, 16, 16],
            decoder_blocks=[1, 1, 1, 1]))
    import copy
    capped = copy.deepcopy(base)
    # PER-SAMPLE caps; 256 pts/sample on a 32x32x16 grid keeps every
    # stage's demand well under these
    capped['backbone']['stage_capacities'] = [384, 256, 192, 128]
    rng = np.random.default_rng(3)
    B, P = 2, 256
    pts = rng.uniform([-12, -12, -3, 0], [12, 12, 3, 1],
                      (B, P, 4)).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool))
    m0 = build_detector_from_cfg(base)
    m1 = build_detector_from_cfg(capped)
    v = m0.init(jax.random.PRNGKey(0), batch, mode='tensor')
    # same param tree (capacities are not parameters) → reuse weights
    out0 = np.asarray(m0.apply(v, batch, mode='tensor'))
    out1 = np.asarray(m1.apply(v, batch, mode='tensor'))
    np.testing.assert_allclose(out1, out0, rtol=1e-5, atol=1e-5)


def test_cylinder3d_seg():
    cfg = dict(
        type='Cylinder3D',
        num_classes=5,
        grid_shape=[32, 24, 8],
        pc_range_cyl=[0.0, -3.14159265, -4.0, 50.0, 3.14159265, 2.0],
        max_voxels=512,
        backbone=dict(
            type='MinkUNetBackbone',
            in_channels=4,
            base_channels=8,
            encoder_channels=[8, 16, 16],
            encoder_blocks=[1, 1, 1],
            decoder_channels=[16, 8, 8],
            decoder_blocks=[1, 1, 1]))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B, P = 1, 256
    pts = rng.uniform([-30, -30, -3, 0], [30, 30, 1, 1],
                      (B, P, 4)).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool),
                 pts_semantic_mask=jnp.asarray(
                     rng.integers(0, 5, (B, P)), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses = model.apply(variables, batch, mode='loss')
    assert np.isfinite(float(losses['loss_sem_seg']))
    preds = model.apply(variables, batch, mode='predict')
    assert preds['pts_semantic_mask'].shape == (B, P)


def test_minkunet_overfits_fixed_batch():
    """Seg overfit (VERDICT r1 item 8): the residual inverse-conv UNet
    must fit a fixed labeled cloud — loss drops sharply and train-set
    accuracy goes high."""
    import optax
    cfg = dict(
        type='MinkUNet', num_classes=4,
        voxel_size=[0.5, 0.5, 0.5],
        point_cloud_range=[-8, -8, -4, 8, 8, 4],
        max_voxels=512,
        backbone=dict(type='MinkUNetBackbone', in_channels=4,
                      base_channels=8,
                      encoder_channels=[8, 16, 16],
                      encoder_blocks=[1, 1, 1],
                      decoder_channels=[16, 8, 8],
                      decoder_blocks=[1, 1, 1]))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B, P = 1, 400
    pts = rng.uniform([-8, -8, -4, 0], [8, 8, 4, 1],
                      (B, P, 4)).astype(np.float32)
    # labels correlated with space (learnable): quadrant id
    labels = ((pts[..., 0] > 0).astype(np.int32) * 2
              + (pts[..., 1] > 0).astype(np.int32))
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool),
                 pts_semantic_mask=jnp.asarray(labels))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    tx = optax.adam(5e-3)
    params = variables['params']
    bs = variables['batch_stats']
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt):
        def lf(p):
            losses, nv = model.apply(
                {'params': p, 'batch_stats': bs}, batch, mode='loss',
                train=True, mutable=['batch_stats'])
            return losses['loss_sem_seg'], nv['batch_stats']
        (l, nbs), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), nbs, opt, l

    losses = []
    for _ in range(60):
        params, bs, opt, l = step(params, bs, opt)
        losses.append(float(l))
    assert losses[-1] < 0.4 * losses[0], (losses[0], losses[-1])
    # train-mode predict (batch BN stats): running averages need many
    # more steps than an overfit test to converge
    preds, _ = model.apply({'params': params, 'batch_stats': bs}, batch,
                           mode='predict', train=True,
                           mutable=['batch_stats'])
    m = np.asarray(preds['mask'])
    acc = (np.asarray(preds['pts_semantic_mask']) == labels)[m].mean()
    assert acc > 0.8, acc


def test_lovasz_softmax_loss_semantics():
    """Perfect one-hot predictions → ~0 loss; wrong predictions → high;
    invalid rows and absent classes don't contribute."""
    from tpu_bev3d.models.losses.losses import lovasz_softmax_loss
    rng = np.random.default_rng(0)
    N, K = 200, 5
    labels = jnp.asarray(rng.integers(0, 3, N))     # classes 3,4 absent
    valid = jnp.asarray(rng.uniform(size=N) > 0.2)
    perfect = jax.nn.one_hot(labels, K) * 20.0
    l0 = float(lovasz_softmax_loss(perfect, labels, valid))
    assert l0 < 0.01, l0
    wrong = jax.nn.one_hot((labels + 1) % 3, K) * 20.0
    l1 = float(lovasz_softmax_loss(wrong, labels, valid))
    assert l1 > 0.5, l1
    # grad flows
    g = jax.grad(lambda lg: lovasz_softmax_loss(lg, labels, valid))(
        jnp.zeros((N, K)))
    assert np.isfinite(np.asarray(g)).all() and np.abs(
        np.asarray(g)).max() > 0
    # flipping predictions on INVALID rows changes nothing
    noise = jnp.where(valid[:, None], perfect,
                      jax.nn.one_hot((labels + 2) % K, K) * 20.0)
    l2 = float(lovasz_softmax_loss(noise, labels, valid))
    assert abs(l2 - l0) < 1e-6


def test_cylinder3d_lovasz_in_losses():
    cfg = dict(
        type='Cylinder3D', num_classes=5,
        grid_shape=[16, 12, 8],
        pc_range_cyl=[0.0, -3.14159265, -4.0, 50.0, 3.14159265, 2.0],
        max_voxels=256, use_lovasz=True,
        backbone=dict(type='MinkUNetBackbone', in_channels=67,
                      base_channels=8, encoder_channels=[8, 16],
                      encoder_blocks=[1, 1], decoder_channels=[16, 8],
                      decoder_blocks=[1, 1]))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B, P = 1, 128
    pts = rng.uniform([-30, -30, -3, 0], [30, 30, 1, 1],
                      (B, P, 4)).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool),
                 pts_semantic_mask=jnp.asarray(
                     rng.integers(0, 5, (B, P)), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses = model.apply(variables, batch, mode='loss')
    assert 'loss_lovasz' in losses
    assert np.isfinite(float(losses['loss_lovasz']))


def test_minkunet_tile_backend_exact():
    """backend='tile' (sorted-key index, tile convs + tile inverse
    convs) reproduces the flat backend's point logits with the same
    params — the segmentor-scale tile path is a pure relayout."""
    base = dict(
        type='MinkUNet',
        num_classes=5,
        voxel_size=[0.8, 0.8, 0.4],
        point_cloud_range=[-12.8, -12.8, -3.2, 12.8, 12.8, 3.2],
        max_voxels=512,
        backbone=dict(
            type='MinkUNetBackbone',
            in_channels=4,
            base_channels=8,
            encoder_channels=[8, 16, 32, 32],
            encoder_blocks=[1, 1, 1, 1],
            decoder_channels=[32, 16, 16, 16],
            decoder_blocks=[1, 1, 1, 1]))
    import copy
    tiled = copy.deepcopy(base)
    tiled['backbone']['backend'] = 'tile'
    tiled['backbone']['tile_shape'] = (2, 4, 4)
    # PER-SAMPLE ample tile caps: grid (16,32,32) → ≤512 (2,4,4)-tiles
    tiled['backbone']['tile_capacities'] = [512, 96, 16, 4, 4]
    rng = np.random.default_rng(5)
    B, P = 2, 256
    pts = rng.uniform([-12, -12, -3, 0], [12, 12, 3, 1],
                      (B, P, 4)).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool))
    m0 = build_detector_from_cfg(base)
    m1 = build_detector_from_cfg(tiled)
    v = m0.init(jax.random.PRNGKey(0), batch, mode='tensor')
    out0 = np.asarray(m0.apply(v, batch, mode='tensor'))
    out1 = np.asarray(m1.apply(v, batch, mode='tensor'))
    np.testing.assert_allclose(out1, out0, rtol=1e-4, atol=1e-4)


def test_cylinder3d_tile_backend_exact():
    """Cylinder3D on backend='tile' (cylindrical grid) == flat backend
    point logits with shared params."""
    base = dict(
        type='Cylinder3D',
        num_classes=5,
        grid_shape=[32, 24, 8],
        pc_range_cyl=[0.0, -3.14159265, -4.0, 50.0, 3.14159265, 2.0],
        max_voxels=512,
        backbone=dict(
            type='MinkUNetBackbone',
            in_channels=4,
            base_channels=8,
            encoder_channels=[8, 16, 16],
            encoder_blocks=[1, 1, 1],
            decoder_channels=[16, 8, 8],
            decoder_blocks=[1, 1, 1]))
    import copy
    tiled = copy.deepcopy(base)
    tiled['backbone']['backend'] = 'tile'
    tiled['backbone']['tile_shape'] = (2, 4, 4)
    tiled['backbone']['tile_capacities'] = [192, 64, 24, 8]
    rng = np.random.default_rng(7)
    B, P = 1, 256
    pts = rng.uniform([-30, -30, -3, 0], [30, 30, 1, 1],
                      (B, P, 4)).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool))
    m0 = build_detector_from_cfg(base)
    m1 = build_detector_from_cfg(tiled)
    v = m0.init(jax.random.PRNGKey(0), batch, mode='tensor')
    out0 = np.asarray(m0.apply(v, batch, mode='tensor'))
    out1 = np.asarray(m1.apply(v, batch, mode='tensor'))
    np.testing.assert_allclose(out1, out0, rtol=1e-4, atol=1e-4)


def test_minkunet_stage_tile_shapes_exact():
    """Mixed per-stage tile shapes (smaller stem tiles, general inverse
    conv on the mixed-shape decoder hops) == flat backend logits."""
    base = dict(
        type='MinkUNet',
        num_classes=5,
        voxel_size=[0.8, 0.8, 0.4],
        point_cloud_range=[-12.8, -12.8, -3.2, 12.8, 12.8, 3.2],
        max_voxels=512,
        backbone=dict(
            type='MinkUNetBackbone',
            in_channels=4,
            base_channels=8,
            encoder_channels=[8, 16, 32, 32],
            encoder_blocks=[1, 1, 1, 1],
            decoder_channels=[32, 16, 16, 16],
            decoder_blocks=[1, 1, 1, 1]))
    import copy
    tiled = copy.deepcopy(base)
    tiled['backbone']['backend'] = 'tile'
    tiled['backbone']['tile_shape'] = (2, 4, 4)
    # stem/decoder-target tiles must stay divisible by the stride (the
    # general inverse conv's tile-invariant window geometry)
    tiled['backbone']['stage_tile_shapes'] = [
        (2, 2, 4), (2, 4, 4), (2, 4, 4), (2, 4, 4), (2, 4, 4)]
    tiled['backbone']['tile_capacities'] = [512, 96, 16, 4, 4]
    rng = np.random.default_rng(7)
    B, P = 2, 256
    pts = rng.uniform([-12, -12, -3, 0], [12, 12, 3, 1],
                      (B, P, 4)).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool))
    m0 = build_detector_from_cfg(base)
    m1 = build_detector_from_cfg(tiled)
    v = m0.init(jax.random.PRNGKey(0), batch, mode='tensor')
    out0 = np.asarray(m0.apply(v, batch, mode='tensor'))
    out1 = np.asarray(m1.apply(v, batch, mode='tensor'))
    np.testing.assert_allclose(out1, out0, rtol=1e-4, atol=1e-4)


def test_minkunet_tile_bf16_close():
    """tile_dtype='bfloat16' (the serving-precision config variant,
    minkunet_tile_bf16_semantickitti.py) stays close to the f32 tile
    logits — the GEMMs run bf16 on the MXU, BN/softmax stay f32."""
    base = dict(
        type='MinkUNet',
        num_classes=5,
        voxel_size=[0.8, 0.8, 0.4],
        point_cloud_range=[-12.8, -12.8, -3.2, 12.8, 12.8, 3.2],
        max_voxels=512,
        backbone=dict(
            type='MinkUNetBackbone',
            in_channels=4,
            base_channels=8,
            encoder_channels=[8, 16, 32, 32],
            encoder_blocks=[1, 1, 1, 1],
            decoder_channels=[32, 16, 16, 16],
            decoder_blocks=[1, 1, 1, 1],
            backend='tile',
            tile_shape=(2, 4, 4),
            tile_capacities=[512, 96, 16, 4, 4]))
    import copy
    b16 = copy.deepcopy(base)
    b16['backbone']['tile_dtype'] = 'bfloat16'
    rng = np.random.default_rng(11)
    B, P = 2, 256
    pts = rng.uniform([-12, -12, -3, 0], [12, 12, 3, 1],
                      (B, P, 4)).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool))
    m0 = build_detector_from_cfg(base)
    m1 = build_detector_from_cfg(b16)
    v = m0.init(jax.random.PRNGKey(0), batch, mode='tensor')
    out0 = np.asarray(m0.apply(v, batch, mode='tensor'))
    out1 = np.asarray(m1.apply(v, batch, mode='tensor'))
    assert np.isfinite(out1).all()
    # bf16 has ~3 decimal digits; a 13-conv-deep UNet compounds it
    np.testing.assert_allclose(out1, out0, rtol=0.12, atol=0.12)
