"""Sparse conv golden tests: compare against dense 3D convolution
(jax.lax.conv_general_dilated) over the scattered dense volume."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpu_bev3d.ops.sparse_conv import (SparseTensor, sparse_conv3d,
                                       subm_conv3d)

SHAPE = (6, 8, 8)  # nz, ny, nx


def make_sparse(rng, n_active=40, capacity=64, cin=8, batch=2):
    coords = set()
    while len(coords) < n_active:
        b = rng.integers(0, batch)
        z, y, x = (rng.integers(0, s) for s in SHAPE)
        coords.add((b, z, y, x))
    coords = np.array(sorted(coords), np.int32)
    feats = rng.standard_normal((n_active, cin)).astype(np.float32)
    fpad = np.zeros((capacity, cin), np.float32)
    cpad = np.full((capacity, 4), -1, np.int32)
    fpad[:n_active] = feats
    cpad[:n_active] = coords
    return SparseTensor(jnp.asarray(fpad), jnp.asarray(cpad), SHAPE, batch)


def dense_of(st):
    return np.asarray(st.dense())  # [B, C, nz, ny, nx]


def dense_conv(x, w_k3, stride, padding):
    """x [B,C,D,H,W]; w_k3 [27, Cin, Cout] in (z,y,x) offset order."""
    k = round(len(w_k3) ** (1 / 3))
    cin, cout = w_k3.shape[1:]
    w = np.asarray(w_k3).reshape(k, k, k, cin, cout)
    out = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w),
        window_strides=(stride,) * 3, padding=[(padding, padding)] * 3,
        dimension_numbers=('NCDHW', 'DHWIO', 'NCDHW'))
    return np.asarray(out)


def test_subm_conv_matches_dense_at_active_sites(rng):
    st = make_sparse(rng)
    w = rng.standard_normal((27, 8, 16)).astype(np.float32) * 0.1
    b = rng.standard_normal(16).astype(np.float32)
    out = subm_conv3d(st, jnp.asarray(w), jnp.asarray(b), kernel_size=3)
    ref = dense_conv(dense_of(st), w, stride=1, padding=1)
    coords = np.asarray(st.coords)
    feats = np.asarray(out.features)
    for i in range(64):
        bb, z, y, x = coords[i]
        if bb < 0:
            assert np.all(feats[i] == 0)
            continue
        np.testing.assert_allclose(feats[i], ref[bb, :, z, y, x] + b,
                                   rtol=1e-4, atol=1e-4)


def test_subm_preserves_coords(rng):
    st = make_sparse(rng)
    w = rng.standard_normal((27, 8, 8)).astype(np.float32)
    out = subm_conv3d(st, jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(out.coords),
                                  np.asarray(st.coords))


def test_strided_conv_matches_dense_at_produced_sites(rng):
    st = make_sparse(rng)
    w = rng.standard_normal((27, 8, 16)).astype(np.float32) * 0.1
    out = sparse_conv3d(st, jnp.asarray(w), kernel_size=3, stride=2,
                        padding=1, out_capacity=64)
    ref = dense_conv(dense_of(st), w, stride=2, padding=1)
    assert out.spatial_shape == (3, 4, 4)
    coords = np.asarray(out.coords)
    feats = np.asarray(out.features)
    n_valid = int((coords[:, 0] >= 0).sum())
    assert n_valid > 0
    for i in range(64):
        bb, z, y, x = coords[i]
        if bb < 0:
            continue
        np.testing.assert_allclose(feats[i], ref[bb, :, z, y, x],
                                   rtol=1e-4, atol=1e-4)


def test_strided_active_set_covers_inputs(rng):
    # every input voxel must land in some output site (floor rule)
    st = make_sparse(rng)
    w = np.zeros((27, 8, 4), np.float32)
    out = sparse_conv3d(st, jnp.asarray(w), kernel_size=3, stride=2,
                        padding=1, out_capacity=64)
    oc = {tuple(c) for c in np.asarray(out.coords).tolist() if c[0] >= 0}
    for c in np.asarray(st.coords).tolist():
        if c[0] < 0:
            continue
        want = (c[0], c[1] // 2, c[2] // 2, c[3] // 2)
        assert want in oc


def test_sparse_conv_grad(rng):
    import jax
    st = make_sparse(rng)
    w = jnp.asarray(rng.standard_normal((27, 8, 8)).astype(np.float32) * 0.1)

    def loss(w):
        out = subm_conv3d(st, w)
        return jnp.sum(out.features ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_pair_key_index_matches_single_key():
    """Huge grids (>2^31 cells, e.g. the faithful MinkUNet SemanticKITTI
    4000x4000x800) take the two-searchsorted pair-key path in
    build_coord_index; it must agree exactly with the single-linear-key
    path on the same coordinate set."""
    import numpy as np
    import jax.numpy as jnp
    from tpu_bev3d.ops.sparse_conv import build_coord_index, lookup_coords

    rng = np.random.default_rng(0)
    small = (8, 16, 16)
    huge = (800, 4000, 4000)   # > 2^31 cells -> pair mode
    N = 64
    c_small = np.stack([rng.integers(0, 2, N),
                        rng.integers(0, small[0], N),
                        rng.integers(0, small[1], N),
                        rng.integers(0, small[2], N)], -1).astype(np.int32)
    c_small[50:, :] = -1   # invalid tail rows
    # same relative coords embedded in the huge grid (scaled offsets)
    c_huge = c_small.copy()
    c_huge[:50, 1] += 100
    c_huge[:50, 2] += 2000
    c_huge[:50, 3] += 3900   # near the x edge

    for coords, shape in ((c_small, small), (c_huge, huge)):
        coords = jnp.asarray(coords)
        idx, valid = build_coord_index(coords, shape, 2)
        mode = idx[0]
        assert mode == ('pair' if shape == huge else 'lin')
        # queries: every row shifted by one in x (some exist, some don't)
        q = coords.at[:, 3].add(1)
        q = jnp.where(valid[:, None], q, -1)
        got, found = lookup_coords(idx, q, valid, shape, 2, N)
        # brute-force oracle
        cs = np.asarray(coords)
        qs = np.asarray(q)
        for i in range(N):
            if qs[i, 0] < 0 or qs[i, 3] >= shape[2]:
                continue
            match = np.nonzero((cs == qs[i]).all(1) & (cs[:, 0] >= 0))[0]
            if len(match):
                assert bool(found[i]), (shape, i)
                assert int(got[i]) == match[0], (shape, i)
            else:
                assert not bool(found[i]), (shape, i)
