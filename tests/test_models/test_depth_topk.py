"""depth_topk sparsified lift: with k close to D the pooled BEV must
approximate the exact dense lift; with peaked depth it must match
closely even for small k."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_bev3d.models.view_transforms.depth_lss import LSSTransform


def _build(k, **kw):
    return LSSTransform(
        in_channels=16, out_channels=8, image_size=(32, 88),
        feature_size=(8, 22), xbound=(-10., 10., 0.5),
        ybound=(-10., 10., 0.5), zbound=(-10., 10., 20.),
        dbound=(1., 13., 1.0), downsample=1, depth_topk=k, **kw)


def _cam_params(B, N, rng):
    intrins = np.tile(np.array([[30., 0, 44.], [0, 30., 16.],
                                [0, 0, 1.]], np.float32), (B, N, 1, 1))
    cam2lidar = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    cam2lidar[:, :, :3, :3] = R
    return dict(cam2lidar=jnp.asarray(cam2lidar),
                intrins=jnp.asarray(intrins),
                post_rots=jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                              (B, N, 1, 1))),
                post_trans=jnp.zeros((B, N, 3), jnp.float32))


@pytest.mark.parametrize('k,tol', [(12, 1e-5), (4, 2.0)])
def test_depth_topk_approximates_dense(k, tol):
    """k = D must be EXACT (renormalization is a no-op). Small k on an
    untrained net (near-uniform softmax) only gets a loose sanity bound —
    the approximation premise is a peaked trained depth head."""
    B, N = 1, 2
    rng = np.random.RandomState(0)
    img = rng.randn(B, N, 8, 22, 16).astype(np.float32)
    cam = _cam_params(B, N, rng)

    dense_m = _build(0)
    variables = dense_m.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    out_dense, _ = dense_m.apply(variables, jnp.asarray(img), cam)
    sparse_m = _build(k)
    out_sparse, _ = sparse_m.apply(variables, jnp.asarray(img), cam)

    a, b = np.asarray(out_sparse), np.asarray(out_dense)
    assert a.shape == b.shape
    denom = max(1e-6, float(np.abs(b).max()))
    assert np.max(np.abs(a - b)) / denom < tol


def test_precomputed_ranks_match_dynamic_geometry():
    """Deploy fast path: pooling with precomputed flat ranks must equal
    the dynamic-geometry path exactly (depth_topk=0)."""
    B, N = 1, 2
    rng = np.random.RandomState(7)
    img = rng.randn(B, N, 8, 22, 16).astype(np.float32)
    cam = _cam_params(B, N, rng)
    m = _build(0)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    out_dyn, _ = m.apply(variables, jnp.asarray(img), cam)
    ranks = m.precompute_bev_ranks(cam)
    cam2 = dict(cam, geom_ranks=ranks)
    out_pre, _ = m.apply(variables, jnp.asarray(img), cam2)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_dyn),
                               rtol=1e-5, atol=1e-5)


def test_camera_mask_zeroes_missing_camera():
    B, N = 1, 2
    rng = np.random.RandomState(8)
    img = rng.randn(B, N, 8, 22, 16).astype(np.float32)
    cam = _cam_params(B, N, rng)
    m = _build(0)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    cam_all = dict(cam, camera_mask=jnp.ones((B, N)))
    cam_one = dict(cam, camera_mask=jnp.asarray([[1.0, 0.0]]))
    out_all, _ = m.apply(variables, jnp.asarray(img), cam_all)
    out_one, _ = m.apply(variables, jnp.asarray(img), cam_one)
    # dropping camera 1 must change the pooled BEV but keep it finite
    assert not np.allclose(np.asarray(out_all), np.asarray(out_one))
    assert np.isfinite(np.asarray(out_one)).all()


def test_precomputed_ranks_with_topk_match_dynamic():
    """Deploy path ∘ top-k: gathering static all-bin ranks by the kept
    bins must equal the online top-k geometry path exactly."""
    B, N = 1, 2
    rng = np.random.RandomState(9)
    img = rng.randn(B, N, 8, 22, 16).astype(np.float32)
    cam = _cam_params(B, N, rng)
    m = _build(6)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    out_dyn, _ = m.apply(variables, jnp.asarray(img), cam)
    ranks = m.precompute_bev_ranks(cam)
    out_pre, _ = m.apply(variables, jnp.asarray(img),
                         dict(cam, geom_ranks=ranks))
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_dyn),
                               rtol=1e-5, atol=1e-5)


def test_geometry_at_bins_bit_exact():
    """The bin-direct geometry path (get_geometry_at_bins, used by the
    top-k lift to skip materializing the full [D] frustum) must be
    BIT-identical to gathering get_geometry's full output along the bin
    axis — same einsum chain, depth values gathered from the same
    create_frustum table."""
    B, N = 2, 3
    rng = np.random.RandomState(3)
    m = _build(4)
    cam = _cam_params(B, N, rng)
    # randomize the rig so the test isn't identity-only
    cam['post_trans'] = jnp.asarray(
        rng.randn(B, N, 3).astype(np.float32) * 0.1)
    pr = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    pr[:, :, 0, 0] = 1.0 + 0.1 * rng.rand(B, N)
    cam['post_rots'] = jnp.asarray(pr)
    aug = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    aug[:, :3, 3] = rng.randn(B, 3).astype(np.float32)
    cam['lidar_aug'] = jnp.asarray(aug)

    fH, fW = m.feature_size
    topi = jnp.asarray(rng.randint(0, m.D, (B, N, fH, fW, 4)), jnp.int32)

    full = m.get_geometry(cam['cam2lidar'], cam['intrins'],
                          cam['post_rots'], cam['post_trans'],
                          cam['lidar_aug'])
    gathered = jnp.take_along_axis(
        jnp.transpose(full, (0, 1, 3, 4, 2, 5)), topi[..., None], axis=4)
    direct = m.get_geometry_at_bins(topi, cam)
    assert np.array_equal(np.asarray(direct), np.asarray(gathered))


def test_topk_lift_matches_gathered_geom_path():
    """End-to-end: the gated geom_at_bins=True forward (geometry only
    at the kept bins) must exactly reproduce the default
    full-geometry+gather formulation."""
    B, N = 1, 2
    rng = np.random.RandomState(11)
    img = rng.randn(B, N, 8, 22, 16).astype(np.float32)
    cam = _cam_params(B, N, rng)
    m = _build(5, geom_at_bins=True)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    out_new, dl = m.apply(variables, jnp.asarray(img), cam)

    # old formulation: full geometry, transpose + gather inside
    # lift_and_pool (geom is not None -> takes the gather branch)
    geom = m.apply(variables, cam['cam2lidar'], cam['intrins'],
                   cam['post_rots'], cam['post_trans'], None,
                   method=type(m).get_geometry)
    out_old = m.apply(
        variables, dl,
        method=lambda mm, dlg: mm.lift_and_pool(
            dlg,
            _feats_of(mm, variables, img, cam),
            geom, cam_params=cam))
    a, b = np.asarray(out_new), np.asarray(out_old)
    assert np.array_equal(a, b)


def _feats_of(mm, variables, img, cam):
    """Recompute the context features exactly as LSSTransform.__call__
    does (depthnet output channels past D)."""
    import flax.linen as nn_
    B, N, fH, fW, C = img.shape
    x = jnp.asarray(img).reshape(B * N, fH, fW, C)
    kernel = variables['params']['depthnet']['kernel']
    bias = variables['params']['depthnet']['bias']
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias
    y = y.reshape(B, N, fH, fW, -1)
    return y[..., mm.D:]


def test_topk_pack_matches_pair_sort():
    """topk_pack=True (single-operand packed int sort, predict-only)
    must reproduce the pair-sort top-k lift within the depth
    quantization tolerance when the depth softmax has no near-ties
    (ties at the 2^-19 quantization step may legitimately swap which
    bin is kept); train=True must fall back to the pair sort exactly."""
    B, N = 1, 2
    rng = np.random.RandomState(13)
    # scaled random logits -> well-separated softmax values per pixel
    img = (rng.randn(B, N, 8, 22, 16) * 2.0).astype(np.float32)
    cam = _cam_params(B, N, rng)
    m_ref = _build(5)
    variables = m_ref.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    out_ref, _ = m_ref.apply(variables, jnp.asarray(img), cam)

    m_pack = _build(5, topk_pack=True)
    out_pack, _ = m_pack.apply(variables, jnp.asarray(img), cam)
    a, b = np.asarray(out_pack), np.asarray(out_ref)
    denom = max(1e-6, float(np.abs(b).max()))
    assert np.max(np.abs(a - b)) / denom < 1e-3

    # train mode ignores the packed path (no depth gradient through int
    # packing) -> bit-identical to the pair-sort model in train mode
    out_tr_pack, _ = m_pack.apply(variables, jnp.asarray(img), cam,
                                  train=True,
                                  rngs={'dropout': jax.random.PRNGKey(1)})
    out_tr_ref, _ = m_ref.apply(variables, jnp.asarray(img), cam,
                                train=True,
                                rngs={'dropout': jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(out_tr_pack),
                                  np.asarray(out_tr_ref))


def test_static_pool_matches_dynamic_exact():
    """static_pool=True with a registered rig plan must reproduce the
    dynamic exact-lift forward (same contributions, f32 accumulation;
    fp add order may differ -> allclose), and fall back to the dynamic
    path when no plan is registered."""
    from tpu_bev3d.models.view_transforms.depth_lss import ensure_pool_plan
    from tpu_bev3d.ops.bev_pool_static import clear_pool_plans

    B, N = 1, 2
    rng = np.random.RandomState(21)
    img = rng.randn(B, N, 8, 22, 16).astype(np.float32)
    cam = _cam_params(B, N, rng)
    m_dyn = _build(0)
    variables = m_dyn.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    out_dyn, _ = m_dyn.apply(variables, jnp.asarray(img), cam)

    m_st = _build(0, static_pool=True, pool_plan_key='test_rig')
    clear_pool_plans()
    # no plan registered -> dynamic fallback, identical output
    out_fb, _ = m_st.apply(variables, jnp.asarray(img), cam)
    np.testing.assert_array_equal(np.asarray(out_fb), np.asarray(out_dyn))

    vt_cfg = dict(image_size=(32, 88), feature_size=(8, 22),
                  xbound=(-10., 10., 0.5), ybound=(-10., 10., 0.5),
                  zbound=(-10., 10., 20.), dbound=(1., 13., 1.0),
                  pool_plan_key='test_rig')
    ensure_pool_plan(vt_cfg, cam)
    out_st, _ = m_st.apply(variables, jnp.asarray(img), cam)
    np.testing.assert_allclose(np.asarray(out_st), np.asarray(out_dyn),
                               rtol=1e-4, atol=1e-4)
    # train mode must ignore the plan (augmented cams would make it stale)
    out_tr, _ = m_st.apply(variables, jnp.asarray(img), cam, True,
                           rngs={'dropout': jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out_tr)).all()
    clear_pool_plans()
