"""Static-plan (gather-only) pool vs the dynamic scatter bev_pool.

The static plan must reproduce the scatter pool's output exactly (same
contribution set + f32 accumulation; only fp add ORDER differs) for the
full all-bins lift, for a zero-masked (top-k-style) lift, and for a
frustum where part of the lattice falls outside the BEV range.
"""
import jax.numpy as jnp
import numpy as np

from tpu_bev3d.ops.bev_pool import bev_pool, compute_flat_ranks
from tpu_bev3d.ops.bev_pool_static import (bev_pool_static,
                                           build_pool_plan_from_ranks)

START = (-2.0, -2.0, 0.0)
INTERVAL = (0.5, 0.5, 4.0)
SHAPE = (8, 8, 1)  # nx, ny, nz


def _make_case(rng, B=2, N=3, D=5, fH=4, fW=6, C=7):
    # geometry in lattice layout [B, N, D, fH, fW, 3]; some points OOB.
    # One rig shared by the whole batch — the static plan's contract.
    geom = rng.uniform(-2.6, 2.6, (1, N, D, fH, fW, 3)).astype(np.float32)
    geom[..., 2] = rng.uniform(-1.0, 5.0, geom.shape[:-1])
    geom = np.broadcast_to(geom, (B,) + geom.shape[1:]).copy()
    depth_w = rng.uniform(0, 1, (B, N, fH, fW, D)).astype(np.float32)
    feats = rng.standard_normal((B, N, fH, fW, C)).astype(np.float32)
    return geom, depth_w, feats


def _scatter_reference(geom, depth_w, feats):
    # the production path: frustum feats = w ⊗ feats in [B,N,D,fH,fW,C]
    frustum = jnp.einsum('bnhwd,bnhwc->bndhwc', depth_w, feats)
    return np.asarray(bev_pool(frustum, geom, bev_start=START,
                               bev_interval=INTERVAL, bev_shape=SHAPE,
                               accum_dtype=jnp.float32))


def _plan_for(geom):
    B, N, D, fH, fW = geom.shape[:5]
    nx, ny, nz = SHAPE
    ranks = np.asarray(compute_flat_ranks(
        jnp.asarray(geom[:1]), START, INTERVAL, SHAPE))[0]
    return build_pool_plan_from_ranks(ranks, n_cells=nx * ny * nz,
                                      N=N, D=D, fH=fH, fW=fW)


def test_static_pool_matches_scatter(rng):
    geom, depth_w, feats = _make_case(rng)
    want = _scatter_reference(geom, depth_w, feats)
    plan = _plan_for(geom)
    got = np.asarray(bev_pool_static(jnp.asarray(depth_w),
                                     jnp.asarray(feats), plan,
                                     bev_shape=SHAPE))
    assert plan['meta']['rows'] > 0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_static_pool_topk_masked_weights(rng):
    # top-k composes by zeroing weights: mask all but the 2 largest bins
    geom, depth_w, feats = _make_case(rng)
    k = 2
    thresh = np.sort(depth_w, axis=-1)[..., -k:-k + 1]
    masked = np.where(depth_w >= thresh, depth_w, 0.0).astype(np.float32)
    want = _scatter_reference(geom, masked, feats)
    plan = _plan_for(geom)
    got = np.asarray(bev_pool_static(jnp.asarray(masked),
                                     jnp.asarray(feats), plan,
                                     bev_shape=SHAPE))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_static_pool_padding_bounded(rng):
    geom, _, _ = _make_case(rng, B=1, N=2, D=8, fH=6, fW=8)
    plan = _plan_for(geom)
    m = plan['meta']
    # bucketing must bound padding waste and cover every valid row
    assert m['pad_frac'] <= 2.0
    assert sum(w.size for w, _ in plan['classes']) == m['padded_rows']


def test_static_pool_grad(rng):
    import jax
    geom, depth_w, feats = _make_case(rng, B=1)
    plan = _plan_for(geom)

    def loss(w, f):
        return jnp.sum(bev_pool_static(w, f, plan, bev_shape=SHAPE) ** 2)

    gw, gf = jax.grad(loss, argnums=(0, 1))(jnp.asarray(depth_w),
                                            jnp.asarray(feats))
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(gf)).all()
