"""DepthLSS training-path fidelity (VERDICT r1 item 3 + Weak #6).

Parity-tests the GT depth histogram (centered binning, bin-0 clearing,
normalization) and the train-time depth calibration against a direct
torch transcription of ref projects/BEVFusion/bevfusion/
depth_lss.py:637-706, and checks the histogram CE loss semantics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _torch_gt_histogram(d, fH, fW, dbound):
    """Direct transcription of ref depth_lss.py:637-695 (numpy)."""
    d0, d1, dst = dbound
    D = int(round((d1 - d0) / dst))
    BN, h, w = d.shape
    cell_j = np.arange(h) // (h // fH)
    cell_i = np.arange(w) // (w // fW)
    cam = np.arange(BN)[:, None, None] * (fH * fW)
    cell_id = cam + cell_j[None, :, None] * fW + cell_i[None, None, :]
    bins = ((np.clip(d, d0, d1 - 0.5 * dst) + 0.5 * dst - d0)
            / dst).astype(np.int64)
    flat = (cell_id * D + bins).ravel()
    # bins==D (returns clamped to d1-step/2): the ref scatter spills into
    # the next cell's bin 0, which is then cleared → net "dropped"
    flat = flat[bins.ravel() < D]
    counts = np.zeros(BN * fH * fW * D)
    np.add.at(counts, flat, 1.0)
    counts = counts.reshape(BN, fH, fW, D)
    counts[..., 0] = 0.0
    distr = counts / (counts.sum(-1, keepdims=True) + 1e-8)
    return distr, counts


def test_gt_depth_histogram_matches_reference_transcription():
    from tpu_bev3d.models.view_transforms.depth_lss import \
        gt_depth_histogram
    rng = np.random.default_rng(0)
    B, N, iH, iW, fH, fW = 1, 2, 32, 48, 4, 6
    dbound = (1.0, 25.0, 1.0)
    d = rng.uniform(0, 30, (B, N, iH, iW)).astype(np.float32)
    d[rng.uniform(size=d.shape) < 0.7] = 0.0      # sparse returns
    distr, counts = gt_depth_histogram(jnp.asarray(d), (fH, fW), dbound)
    distr_t, counts_t = _torch_gt_histogram(
        d.reshape(B * N, iH, iW), fH, fW, dbound)
    np.testing.assert_allclose(np.asarray(counts).reshape(B * N, fH, fW, -1),
                               counts_t, atol=0)
    np.testing.assert_allclose(np.asarray(distr).reshape(B * N, fH, fW, -1),
                               distr_t, atol=1e-6)
    # centered binning: a return at exactly d0 + k*step lands in bin k
    d2 = np.zeros((1, 1, 8, 8), np.float32)
    d2[0, 0, 0, 0] = 1.0 + 5 * 1.0                # k = 5
    d2[0, 0, 0, 1] = 1.0 + 5 * 1.0 - 0.4          # still bin 5 (centered)
    _, c2 = gt_depth_histogram(jnp.asarray(d2), (1, 1), dbound)
    c2 = np.asarray(c2)[0, 0, 0, 0]
    assert c2[5] == 2.0 and c2.sum() == 2.0


def test_depth_calibration_gated_and_applied():
    """train=True + depth_calibration lifts with depth + sg(max(gt, est)
    - est): the camera BEV must change when lidar evidence disagrees with
    the prediction, and be unchanged when the gate is off."""
    from tpu_bev3d.models.view_transforms.depth_lss import \
        DepthLSSTransform
    kw = dict(in_channels=16, out_channels=8, image_size=(32, 48),
              feature_size=(4, 6), xbound=(-10.0, 10.0, 2.0),
              ybound=(-10.0, 10.0, 2.0), zbound=(-10.0, 10.0, 20.0),
              dbound=(1.0, 9.0, 1.0), downsample=1)
    rng = np.random.default_rng(1)
    B, N = 1, 2
    img = rng.normal(0, 1, (B, N, 4, 6, 16)).astype(np.float32)
    intrins = np.tile(np.array([[20., 0, 24.], [0, 20., 16.],
                                [0, 0, 1.]], np.float32), (B, N, 1, 1))
    cam2lidar = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    cam2lidar[:, :, :3, :3] = R
    K4 = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    K4[:, :, :3, :3] = intrins
    lidar2img = K4 @ np.linalg.inv(cam2lidar)
    cam_params = dict(
        cam2lidar=jnp.asarray(cam2lidar), intrins=jnp.asarray(intrins),
        post_rots=jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                      (B, N, 1, 1))),
        post_trans=jnp.asarray(np.zeros((B, N, 3), np.float32)),
        lidar2img=jnp.asarray(lidar2img))
    pts = rng.normal(0, 3, (B, 256, 5)).astype(np.float32)
    pts[..., 0] = np.abs(pts[..., 0]) + 2.0
    pmask = jnp.ones((B, 256), bool)
    pts = jnp.asarray(pts)

    on = DepthLSSTransform(**kw, depth_calibration=True)
    off = DepthLSSTransform(**kw, depth_calibration=False)
    v = on.init(jax.random.PRNGKey(0), jnp.asarray(img), cam_params,
                points=pts, points_mask=pmask)
    (out_on, _), _ = on.apply(v, jnp.asarray(img), cam_params, points=pts,
                              points_mask=pmask, train=True,
                              mutable=['batch_stats'])
    (out_off, _), _ = off.apply(v, jnp.asarray(img), cam_params,
                                points=pts, points_mask=pmask, train=True,
                                mutable=['batch_stats'])
    assert np.max(np.abs(np.asarray(out_on) - np.asarray(out_off))) > 1e-4
    # eval mode: calibration must be inert (checkpoint parity unchanged)
    out_e1, _ = on.apply(v, jnp.asarray(img), cam_params, points=pts,
                         points_mask=pmask, train=False)
    out_e2, _ = off.apply(v, jnp.asarray(img), cam_params, points=pts,
                          points_mask=pmask, train=False)
    np.testing.assert_allclose(np.asarray(out_e1), np.asarray(out_e2))


def test_histogram_depth_loss_semantics():
    """CE vs the GT histogram: predicting exactly the histogram gives
    loss == mean cell entropy (the CE lower bound); a uniform prediction
    scores strictly worse; cells without returns contribute nothing."""
    from tpu_bev3d.models.view_transforms.depth_lss import (
        DepthLSSTransform, gt_depth_histogram, project_points_to_depth)
    kw = dict(in_channels=8, out_channels=4, image_size=(32, 48),
              feature_size=(4, 6), xbound=(-10.0, 10.0, 2.0),
              ybound=(-10.0, 10.0, 2.0), zbound=(-10.0, 10.0, 20.0),
              dbound=(1.0, 9.0, 1.0), downsample=1)
    m = DepthLSSTransform(**kw)
    rng = np.random.default_rng(2)
    B, N = 1, 2
    intrins = np.tile(np.array([[20., 0, 24.], [0, 20., 16.],
                                [0, 0, 1.]], np.float32), (B, N, 1, 1))
    cam2lidar = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    cam2lidar[:, :, :3, :3] = R
    K4 = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    K4[:, :, :3, :3] = intrins
    lidar2img = jnp.asarray(K4 @ np.linalg.inv(cam2lidar))
    cam_params = dict(lidar2img=lidar2img)
    pts = rng.normal(0, 3, (B, 256, 5)).astype(np.float32)
    pts[..., 0] = np.abs(pts[..., 0]) + 2.0
    pts = jnp.asarray(pts)
    pmask = jnp.ones((B, 256), bool)

    dm = project_points_to_depth(pts, pmask, lidar2img, (32, 48))
    distr, counts = gt_depth_histogram(dm, (4, 6), kw['dbound'])
    has = np.asarray(jnp.sum(counts, -1) > 0)
    assert has.sum() > 0
    D = distr.shape[-1]
    # logits = log(gt + eps) → softmax ≈ gt distribution
    perfect = jnp.log(distr + 1e-8)
    loss_p = float(m.depth_loss(perfect, pts, pmask, cam_params))
    ent = np.asarray(-jnp.sum(distr * jnp.log(distr + 1e-8), -1))
    exp = ent[has].mean()
    assert abs(loss_p - exp) < 0.05, (loss_p, exp)
    uniform = jnp.zeros_like(perfect)
    loss_u = float(m.depth_loss(uniform, pts, pmask, cam_params))
    assert loss_u > loss_p + 0.1
    # grad flows to the prediction
    g = jax.grad(lambda lg: m.depth_loss(lg, pts, pmask, cam_params))(
        uniform)
    assert np.isfinite(np.asarray(g)).all() and np.abs(
        np.asarray(g)).max() > 0


def test_swin_drop_path_train_stochastic_eval_inert():
    """drop_path_rate/drop_rate (VERDICT r1 item 5): train-mode forward
    is stochastic across dropout rngs; eval-mode output is bit-identical
    to a rate-0 model with the same params (checkpoint parity)."""
    from tpu_bev3d.models.backbones.swin import SwinTransformer
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    m0 = SwinTransformer(embed_dims=16, depths=(2, 2), num_heads=(2, 2),
                         window_size=4, out_indices=(0, 1))
    md = SwinTransformer(embed_dims=16, depths=(2, 2), num_heads=(2, 2),
                         window_size=4, out_indices=(0, 1),
                         drop_path_rate=0.5, drop_rate=0.1,
                         attn_drop_rate=0.1)
    v = m0.init(jax.random.PRNGKey(0), x)
    # same param tree: regularization adds no parameters
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        md.init(jax.random.PRNGKey(0), x))
    # eval: exactly inert
    o0 = m0.apply(v, x, train=False)
    od = md.apply(v, x, train=False)
    for a, b in zip(o0, od):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train: stochastic across rngs, and differs from eval
    t1 = md.apply(v, x, train=True,
                  rngs={'dropout': jax.random.PRNGKey(1)})
    t2 = md.apply(v, x, train=True,
                  rngs={'dropout': jax.random.PRNGKey(2)})
    assert np.max(np.abs(np.asarray(t1[0]) - np.asarray(t2[0]))) > 1e-5
    assert np.max(np.abs(np.asarray(t1[0]) - np.asarray(o0[0]))) > 1e-5
    # expectation preserved roughly: survivor rescaling keeps magnitudes
    r0 = float(jnp.mean(jnp.abs(o0[0])))
    rt = float(np.mean([float(jnp.mean(jnp.abs(md.apply(
        v, x, train=True,
        rngs={'dropout': jax.random.PRNGKey(k)})[0]))) for k in range(6)]))
    assert 0.5 * r0 < rt < 2.0 * r0


def test_swin_window_packing_exact():
    """pack_windows (MXU tile packing) is BIT-equivalent in value to the
    unpacked attention — cross-window logits are -inf before softmax —
    including through shifted blocks on non-divisible maps."""
    from tpu_bev3d.models.backbones.swin import SwinTransformer
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(0, 1, (2, 40, 60, 3)).astype(np.float32))
    m1 = SwinTransformer(embed_dims=16, depths=(2, 2), num_heads=(2, 2),
                         window_size=4, out_indices=(0, 1))
    m2 = SwinTransformer(embed_dims=16, depths=(2, 2), num_heads=(2, 2),
                         window_size=4, out_indices=(0, 1),
                         pack_windows=2)
    v = m1.init(jax.random.PRNGKey(0), x)
    o1 = m1.apply(v, x, train=False)
    o2 = m2.apply(v, x, train=False)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_swin_remat_grad_parity():
    """remat=True (jax.checkpoint per block) changes only the memory
    schedule: params, forward outputs and GRADIENTS match the stored-
    activation model (activation recompute is exact)."""
    from tpu_bev3d.models.backbones.swin import SwinTransformer
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    kw = dict(embed_dims=16, depths=(2, 2), num_heads=(2, 2),
              window_size=4, out_indices=(0, 1))
    m1 = SwinTransformer(**kw)
    m2 = SwinTransformer(remat=True, **kw)
    v = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m2.init(jax.random.PRNGKey(0), x))
    o1 = m1.apply(v, x, train=False)
    o2 = m2.apply(v, x, train=False)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def loss(fn):
        def f(params, xx):
            outs = fn.apply(params, xx, train=True,
                            rngs={'dropout': jax.random.PRNGKey(3)})
            return sum(jnp.sum(o * o) for o in outs)
        return f

    g1 = jax.grad(loss(m1))(v, x)
    g2 = jax.grad(loss(m2))(v, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
