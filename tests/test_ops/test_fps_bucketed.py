"""Bucketed (subsample-union) FPS: validity + coverage-quality A/B vs
exact FPS (the sampling-equivalence evidence VERDICT r4 item 2 asks for).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_bev3d.ops.pointnet_ops import (furthest_point_sample,
                                        furthest_point_sample_bucketed,
                                        furthest_point_sample_fused,
                                        furthest_point_sample_fused_bucketed)


def _coverage(xyz, mask, idx):
    """FPS objective: max over valid points of distance to nearest sample
    (smaller = better coverage)."""
    d = np.linalg.norm(xyz[:, None] - xyz[idx][None], axis=-1)
    return float(np.where(mask, d.min(axis=1), 0.0).max())


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_bucketed_fps_validity_and_coverage(seed):
    rng = np.random.RandomState(seed)
    P, S, G = 4096, 256, 8
    xyz = rng.randn(P, 3).astype(np.float32) * np.array([10, 10, 2],
                                                        np.float32)
    mask = np.ones(P, bool)
    idx_b = np.asarray(furthest_point_sample_bucketed(
        jnp.asarray(xyz), jnp.asarray(mask), S, G))
    # all indices in range, all selected points valid, no duplicates
    assert idx_b.shape == (S,)
    assert ((idx_b >= 0) & (idx_b < P)).all()
    assert mask[idx_b].all()
    assert len(set(idx_b.tolist())) == S
    # chunk g only ever returns indices ≡ g (mod G)
    assert (idx_b.reshape(G, S // G) % G ==
            np.arange(G)[:, None]).all()
    # coverage within a small factor of exact FPS
    idx_e = np.asarray(furthest_point_sample(
        jnp.asarray(xyz), jnp.asarray(mask), S))
    cov_b = _coverage(xyz, mask, idx_b)
    cov_e = _coverage(xyz, mask, idx_e)
    assert cov_b <= 1.8 * cov_e, (cov_b, cov_e)


def test_bucketed_fps_padding_tail():
    """Invalid tail points are never selected while valid ones remain in
    the chunk; fully-invalid chunks yield masked-out picks only."""
    rng = np.random.RandomState(0)
    P, S, G = 1024, 64, 8
    xyz = rng.randn(P, 3).astype(np.float32)
    mask = np.zeros(P, bool)
    mask[:900] = True          # ~12% padding, interleaved across chunks
    idx = np.asarray(furthest_point_sample_bucketed(
        jnp.asarray(xyz), jnp.asarray(mask), S, G))
    # every chunk has >=8 valid points (900/8 > 100 > 8) so all picks valid
    assert mask[idx].all()


def test_bucketed_fps_g1_is_exact():
    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.randn(512, 3).astype(np.float32))
    mask = jnp.ones(512, bool)
    a = furthest_point_sample_bucketed(xyz, mask, 64, 1)
    b = furthest_point_sample(xyz, mask, 64)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_bucketed_fused_fps():
    rng = np.random.RandomState(4)
    P, S, G = 1024, 64, 8
    xyz = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(P, 16).astype(np.float32))
    mask = jnp.ones(P, bool)
    idx = np.asarray(furthest_point_sample_fused_bucketed(
        xyz, feats, mask, S, G))
    assert ((idx >= 0) & (idx < P)).all()
    assert len(set(idx.tolist())) == S
    # G=1 falls through to exact fused
    a = furthest_point_sample_fused_bucketed(xyz, feats, mask, S, 1)
    b = furthest_point_sample_fused(xyz, feats, mask, S)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_pallas_stem_scatter_matches_xla():
    """Pallas fused stem kernel (interpret mode) == fused_stem_scatter
    (the VERDICT r4 item-9 measured-attempt kernel)."""
    from tpu_bev3d.ops.pallas_stem import pallas_stem_scatter
    from tpu_bev3d.models.middle_encoders.bev_column_encoder import \
        fused_stem_scatter
    rng = np.random.RandomState(1)
    V, C, ch0 = 300, 5, 16
    nz, ny, nx, p = 4, 16, 16, 2
    coords = np.full((V, 4), -1, np.int32)
    n = 250
    coords[:n, 0] = rng.randint(0, 2, n)
    coords[:n, 1] = rng.randint(0, nz, n)
    coords[:n, 2] = rng.randint(0, ny, n)
    coords[:n, 3] = rng.randint(0, nx, n)
    feats = rng.randn(V, C).astype(np.float32)
    w = (rng.randn(nz * p * p, C, ch0) * 0.1).astype(np.float32)
    a = pallas_stem_scatter(jnp.asarray(feats), jnp.asarray(coords),
                            jnp.asarray(w), batch_size=2, nz=nz, ny=ny,
                            nx=nx, pack_xy=p, max_rows=128,
                            interpret=True)
    b = fused_stem_scatter(jnp.asarray(feats), jnp.asarray(coords),
                           jnp.asarray(w), batch_size=2, nz=nz, ny=ny,
                           nx=nx, pack_xy=p)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)
