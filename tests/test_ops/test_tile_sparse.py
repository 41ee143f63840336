"""Tile (block-sparse) conv backend: parity with the flat gather-GEMM
backend (ops/sparse_conv.py) and with a dense-conv oracle for the exact
spconv active-set rule."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpu_bev3d.ops.sparse_conv import (SparseTensor, sparse_conv3d,
                                       subm_conv3d)
from tpu_bev3d.ops.tile_sparse import (sparse_conv3d_tile, subm_conv3d_tile,
                                       tile_dense, tiles_from_sparse,
                                       tiles_to_sparse)

SHAPE = (6, 12, 16)  # nz, ny, nx


def make_sparse(rng, n_active=70, capacity=96, cin=8, batch=2,
                shape=SHAPE):
    coords = set()
    while len(coords) < n_active:
        b = rng.integers(0, batch)
        z, y, x = (rng.integers(0, s) for s in shape)
        coords.add((b, z, y, x))
    coords = np.array(sorted(coords), np.int32)
    feats = rng.standard_normal((n_active, cin)).astype(np.float32)
    fpad = np.zeros((capacity, cin), np.float32)
    cpad = np.full((capacity, 4), -1, np.int32)
    fpad[:n_active] = feats
    cpad[:n_active] = coords
    return SparseTensor(jnp.asarray(fpad), jnp.asarray(cpad), shape, batch)


def dense_map(st):
    """dict (b,z,y,x) → feature row, for order-free comparison."""
    out = {}
    c = np.asarray(st.coords)
    f = np.asarray(st.features)
    for i in range(len(c)):
        if c[i, 0] >= 0:
            out[tuple(c[i])] = f[i]
    return out


def tile_map(tt):
    return dense_map(tiles_to_sparse(tt))


def test_roundtrip_and_dense(rng):
    st = make_sparse(rng)
    tt = tiles_from_sparse(st, (2, 4, 4), capacity=80)
    # every voxel survives the round trip
    a, b = dense_map(st), tile_map(tt)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tile_dense(tt)),
                               np.asarray(st.dense()), rtol=1e-6)


def test_subm_parity_with_flat(rng):
    st = make_sparse(rng)
    w = (rng.standard_normal((27, 8, 16)) * 0.2).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    ref = subm_conv3d(st, jnp.asarray(w), jnp.asarray(b), kernel_size=3)
    tt = tiles_from_sparse(st, (2, 4, 4), capacity=80)
    out = subm_conv3d_tile(tt, jnp.asarray(w), jnp.asarray(b),
                           kernel_size=3)
    a, b_ = dense_map(ref), tile_map(out)
    assert set(a) == set(b_)
    for k in a:
        np.testing.assert_allclose(a[k], b_[k], rtol=1e-4, atol=1e-4)


def test_subm_k1z_kernel(rng):
    """(3,1,1) kernels (z-only) exercise per-axis halo widths."""
    st = make_sparse(rng)
    w = (rng.standard_normal((3, 8, 8)) * 0.3).astype(np.float32)
    ref = subm_conv3d(st, jnp.asarray(w), kernel_size=(3, 1, 1))
    tt = tiles_from_sparse(st, (2, 4, 4), capacity=80)
    out = subm_conv3d_tile(tt, jnp.asarray(w), kernel_size=(3, 1, 1))
    a, b_ = dense_map(ref), tile_map(out)
    assert set(a) == set(b_)
    for k in a:
        np.testing.assert_allclose(a[k], b_[k], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('pad', [1, 0, (0, 1, 1)])
def test_strided_floor_parity_with_flat(rng, pad):
    st = make_sparse(rng)
    w = (rng.standard_normal((27, 8, 16)) * 0.2).astype(np.float32)
    ref = sparse_conv3d(st, jnp.asarray(w), kernel_size=3, stride=2,
                        padding=pad, out_capacity=96)
    tt = tiles_from_sparse(st, (2, 4, 4), capacity=80)
    out = sparse_conv3d_tile(tt, jnp.asarray(w), kernel_size=3, stride=2,
                             padding=pad, rule='floor')
    a, b_ = dense_map(ref), tile_map(out)
    assert set(a) == set(b_), (
        f'site sets differ: only-flat={set(a)-set(b_)} '
        f'only-tile={set(b_)-set(a)}')
    for k in a:
        np.testing.assert_allclose(a[k], b_[k], rtol=1e-4, atol=1e-4)


def test_strided_zonly_conv_out(rng):
    """BEVFusion conv_out: kernel (3,1,1), stride (2,1,1), pad 0."""
    st = make_sparse(rng)
    w = (rng.standard_normal((3, 8, 16)) * 0.3).astype(np.float32)
    ref = sparse_conv3d(st, jnp.asarray(w), kernel_size=(3, 1, 1),
                        stride=(2, 1, 1), padding=0, out_capacity=96)
    tt = tiles_from_sparse(st, (2, 4, 4), capacity=80)
    out = sparse_conv3d_tile(tt, jnp.asarray(w), kernel_size=(3, 1, 1),
                             stride=(2, 1, 1), padding=0, rule='floor')
    a, b_ = dense_map(ref), tile_map(out)
    assert set(a) == set(b_)
    for k in a:
        np.testing.assert_allclose(a[k], b_[k], rtol=1e-4, atol=1e-4)


def test_spconv_rule_matches_dense_oracle(rng):
    """rule='spconv': active set == {sites whose k-window holds any active
    input} (the exact spconv receptive-field rule), values == dense conv."""
    st = make_sparse(rng)
    w = (rng.standard_normal((27, 8, 16)) * 0.2).astype(np.float32)
    tt = tiles_from_sparse(st, (2, 4, 4), capacity=80)
    out = sparse_conv3d_tile(tt, jnp.asarray(w), kernel_size=3, stride=2,
                             padding=1, rule='spconv')
    got = tile_map(out)

    dense = np.asarray(st.dense())                   # [B, C, nz, ny, nx]
    occ = (np.abs(dense).sum(1, keepdims=True) > 0).astype(np.float32)
    # oracle occupancy: maxpool k=3 s=2 p=1 — but occupancy of a voxel
    # whose features are exactly zero would be missed; plant via mask
    occm = np.zeros_like(occ)
    c = np.asarray(st.coords)
    for i in range(len(c)):
        if c[i, 0] >= 0:
            occm[c[i, 0], 0, c[i, 1], c[i, 2], c[i, 3]] = 1.0
    pooled = lax.reduce_window(
        jnp.asarray(occm), 0.0, lax.max, (1, 1, 3, 3, 3),
        (1, 1, 2, 2, 2), [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1)])
    pooled = np.asarray(pooled)[:, 0]
    want_sites = {(b, z, y, x)
                  for b in range(pooled.shape[0])
                  for z in range(pooled.shape[1])
                  for y in range(pooled.shape[2])
                  for x in range(pooled.shape[3])
                  if pooled[b, z, y, x] > 0}
    assert set(got) == want_sites

    kk = np.asarray(w).reshape(3, 3, 3, 8, 16)
    ref = lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(kk), window_strides=(2, 2, 2),
        padding=[(1, 1)] * 3, dimension_numbers=('NCDHW', 'DHWIO', 'NCDHW'))
    ref = np.asarray(ref)
    for (b, z, y, x), v in got.items():
        np.testing.assert_allclose(v, ref[b, :, z, y, x],
                                   rtol=1e-4, atol=1e-4)


def test_grad_flows(rng):
    import jax
    st = make_sparse(rng, n_active=30, capacity=40)
    w = jnp.asarray((rng.standard_normal((27, 8, 8)) * 0.2)
                    .astype(np.float32))

    def loss(w):
        tt = tiles_from_sparse(st, (2, 4, 4), capacity=48)
        out = subm_conv3d_tile(tt, w)
        out = sparse_conv3d_tile(out, w, stride=2, padding=1)
        return jnp.sum(out.features ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_sorted_index_matches_dense(rng):
    """'sorted' index mode (searchsorted key table — the segmentor-scale
    path) builds bit-identical tables/neighbors/outputs to 'dense'."""
    st = make_sparse(rng)
    td = tiles_from_sparse(st, (2, 4, 4), capacity=80)
    tsr = tiles_from_sparse(st, (2, 4, 4), capacity=80,
                            index_mode='sorted')
    for name in ('features', 'mask', 'tile_coords', 'nb_idx'):
        np.testing.assert_array_equal(np.asarray(getattr(td, name)),
                                      np.asarray(getattr(tsr, name)),
                                      err_msg=name)
    w = rng.standard_normal((27, 8, 12)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(subm_conv3d_tile(tsr, jnp.asarray(w)).features),
        np.asarray(subm_conv3d_tile(td, jnp.asarray(w)).features),
        rtol=1e-6)
    w2 = rng.standard_normal((8, 8, 12)).astype(np.float32)
    sd = sparse_conv3d_tile(td, jnp.asarray(w2), kernel_size=2,
                            stride=2, padding=0, out_capacity=80)
    ss = sparse_conv3d_tile(tsr, jnp.asarray(w2), kernel_size=2,
                            stride=2, padding=0, out_capacity=80)
    assert ss.index_mode == 'sorted'
    np.testing.assert_array_equal(np.asarray(sd.tile_coords),
                                  np.asarray(ss.tile_coords))
    np.testing.assert_allclose(np.asarray(sd.features),
                               np.asarray(ss.features), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(sd.mask),
                                  np.asarray(ss.mask))


@pytest.mark.parametrize('index_mode', ['dense', 'sorted'])
def test_inverse_conv_matches_flat(rng, index_mode):
    """tile_inverse_conv3d (k2-s2 UNet-decoder geometry) == the flat
    backend's sparse_inverse_conv3d on the same target table."""
    from tpu_bev3d.ops.sparse_conv import sparse_inverse_conv3d
    from tpu_bev3d.ops.tile_sparse import (tile_gather_voxels,
                                           tile_inverse_conv3d)
    st = make_sparse(rng)
    tt = tiles_from_sparse(st, (2, 4, 4), capacity=80,
                           index_mode=index_mode)
    w2 = rng.standard_normal((8, 8, 12)).astype(np.float32)
    coarse = sparse_conv3d_tile(tt, jnp.asarray(w2), kernel_size=2,
                                stride=2, padding=0, out_capacity=80)
    winv = rng.standard_normal((8, 12, 6)).astype(np.float32)
    bias = rng.standard_normal((6,)).astype(np.float32)
    got_t = tile_inverse_conv3d(coarse, tt, jnp.asarray(winv),
                                bias=jnp.asarray(bias),
                                kernel_size=2, stride=2)
    got = np.asarray(tile_gather_voxels(got_t, st.coords))
    coarse_sp = tiles_to_sparse(coarse, capacity=st.coords.shape[0])
    ref = sparse_inverse_conv3d(coarse_sp, st.coords, st.valid,
                                st.spatial_shape, jnp.asarray(winv),
                                bias=jnp.asarray(bias),
                                kernel_size=2, stride=2, padding=0)
    refm = np.where(np.asarray(st.valid)[:, None],
                    np.asarray(ref.features), 0)
    np.testing.assert_allclose(got, refm, atol=1e-5)


def test_gather_voxels_roundtrip(rng):
    from tpu_bev3d.ops.tile_sparse import tile_gather_voxels
    st = make_sparse(rng)
    tt = tiles_from_sparse(st, (2, 4, 4), capacity=80,
                           index_mode='sorted')
    got = np.asarray(tile_gather_voxels(tt, st.coords))
    ref = np.where(np.asarray(st.valid)[:, None],
                   np.asarray(st.features), 0)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_inverse_conv_grad_matches_flat(rng):
    """AD through tile_inverse_conv3d == AD through the flat inverse
    conv (same loss, same cotangents on the coarse features)."""
    import jax
    from tpu_bev3d.ops.sparse_conv import sparse_inverse_conv3d
    from tpu_bev3d.ops.tile_sparse import (tile_gather_voxels,
                                           tile_inverse_conv3d)
    st = make_sparse(rng)
    tt = tiles_from_sparse(st, (2, 4, 4), capacity=80,
                           index_mode='sorted')
    w2 = jnp.asarray(rng.standard_normal((8, 8, 12)).astype(np.float32))
    winv = jnp.asarray(rng.standard_normal((8, 12, 6)).astype(np.float32))

    def loss_tile(w):
        coarse = sparse_conv3d_tile(tt, w2, kernel_size=2, stride=2,
                                    padding=0, out_capacity=80)
        out = tile_inverse_conv3d(coarse, tt, w, kernel_size=2, stride=2)
        rows = tile_gather_voxels(out, st.coords)
        return jnp.sum(rows ** 2)

    def loss_flat(w):
        coarse = sparse_conv3d_tile(tt, w2, kernel_size=2, stride=2,
                                    padding=0, out_capacity=80)
        coarse_sp = tiles_to_sparse(coarse, capacity=st.coords.shape[0])
        ref = sparse_inverse_conv3d(coarse_sp, st.coords, st.valid,
                                    st.spatial_shape, w,
                                    kernel_size=2, stride=2, padding=0)
        return jnp.sum(ref.features ** 2)

    gt = jax.grad(loss_tile)(winv)
    gf = jax.grad(loss_flat)(winv)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gf),
                               rtol=1e-3, atol=1e-3)


def test_sorted_index_capacity_overflow_matches_dense(rng):
    """Capacity BELOW the active-tile count: the sorted builder's drop
    rule (lowest linear ids survive) must match the dense cumsum
    bit-for-bit (advisor r4: the overflow path was untested)."""
    st = make_sparse(rng, n_active=120, capacity=160)
    for cap in (8, 17, 40):
        td = tiles_from_sparse(st, (2, 4, 4), capacity=cap,
                               index_mode='dense')
        ts = tiles_from_sparse(st, (2, 4, 4), capacity=cap,
                               index_mode='sorted')
        np.testing.assert_array_equal(np.asarray(td.tile_coords),
                                      np.asarray(ts.tile_coords))
        np.testing.assert_array_equal(np.asarray(td.mask),
                                      np.asarray(ts.mask))
        np.testing.assert_array_equal(np.asarray(td.features),
                                      np.asarray(ts.features))
        np.testing.assert_array_equal(np.asarray(td.nb_idx),
                                      np.asarray(ts.nb_idx))


def _make_pair(rng, shape=(8, 12, 12), n_coarse=40, n_fine=90,
               coarse_shape=None):
    """Random coarse + fine sparse tensors for inverse-conv tests."""
    cs = coarse_shape or tuple(s // 2 for s in shape)
    def mk(n, sp, cap):
        coords = set()
        while len(coords) < n:
            b = rng.integers(0, 2)
            z, y, x = (rng.integers(0, s) for s in sp)
            coords.add((b, z, y, x))
        coords = np.array(sorted(coords), np.int32)
        feats = rng.standard_normal((n, 6)).astype(np.float32)
        fp = np.zeros((cap, 6), np.float32); fp[:n] = feats
        cp = np.full((cap, 4), -1, np.int32); cp[:n] = coords
        from tpu_bev3d.ops.sparse_conv import SparseTensor
        return SparseTensor(jnp.asarray(fp), jnp.asarray(cp), sp, 2)
    return mk(n_coarse, cs, 64), mk(n_fine, shape, 128)


@pytest.mark.parametrize('geom', [
    dict(kernel_size=3, stride=2, padding=1),
    dict(kernel_size=3, stride=2, padding=0),
    dict(kernel_size=2, stride=2, padding=0),
    dict(kernel_size=3, stride=1, padding=1),
])
@pytest.mark.parametrize('index_mode', ['dense', 'sorted'])
def test_general_tile_inverse_matches_flat(rng, geom, index_mode):
    from tpu_bev3d.ops.sparse_conv import sparse_inverse_conv3d
    from tpu_bev3d.ops.tile_sparse import tile_inverse_conv3d_general
    shape = (8, 12, 12)
    cs = shape if geom['stride'] == 1 else tuple(s // 2 for s in shape)
    coarse, fine = _make_pair(rng, shape, coarse_shape=cs)
    k3 = int(np.prod([geom['kernel_size']] * 3))
    w = (rng.standard_normal((k3, 6, 5)) * 0.3).astype(np.float32)

    ref = sparse_inverse_conv3d(coarse, fine.coords, fine.valid,
                                shape, jnp.asarray(w), **geom)

    tc_c = tiles_from_sparse(coarse, (2, 4, 4), capacity=48,
                             index_mode=index_mode)
    tc_f = tiles_from_sparse(fine, (2, 2, 4), capacity=96,
                             index_mode=index_mode)
    out = tile_inverse_conv3d_general(tc_c, tc_f, jnp.asarray(w), **geom)

    got = tile_map(out)
    rc = np.asarray(ref.coords)
    rf = np.asarray(ref.features)
    want = {tuple(rc[i]): rf[i] for i in range(len(rc)) if rc[i, 0] >= 0}
    assert set(got) == set(want)
    for kk in want:
        np.testing.assert_allclose(got[kk], want[kk], rtol=2e-4,
                                   atol=2e-4)
