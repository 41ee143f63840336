"""Sparse 3D convolution on TPU: gather-GEMM over kernel offsets.

Replaces the traveller59 spconv backend + the reference's deployment shim
(ref: projects/SparseConvolution/sparse_conv.py:160-262 implicit-GEMM
rulebook/matmul, mmdet3d/models/layers/sparse_block.py).

TPU design. Active voxels live in a fixed-capacity padded table:
``features [N, C]``, ``coords [N, 4]`` (b, z, y, x; -1 = empty slot). The
"rulebook" is not materialized: per kernel offset we compute each output
voxel's needed input coordinate, binary-search it in a sorted linear-id index
(``jnp.searchsorted`` — O(N log N), no atomics, no dynamic shapes), gather
(missing → zeros) and accumulate one [N, Cin] x [Cin, Cout] matmul per
offset via ``lax.scan``. All FLOPs land on the MXU as large dense GEMMs;
the sparsity shows up only as masked gathers. The K³ over-compute vs a
packed rulebook is ~3-9x FLOPs, but the GEMMs are so small relative to MXU
throughput (~40 GFLOP/frame for the BEVFusion encoder) that staying dense
and batched wins on TPU.

Downsampling note: for strided convs the reference (spconv) activates every
output site whose receptive field touches an input. We default to the
cheaper ``floor`` active-set rule — output sites = unique(floor((coord +
pad_eff) / stride)) — a subset of spconv's set that avoids a K³-candidate
sort per layer. Convolution values at the produced sites are exact; we train
from scratch so the slightly sparser active set is a design choice, not an
approximation of fixed weights. MEASURED deviation on a real KITTI cloud
(tests/test_ops/test_strided_active_set_deviation.py): the floor set misses
58/64/66% of spconv's active sites across three cascaded stride-2 stages —
material, so converted torch checkpoints MUST run the tile backend's
``rule='spconv'`` (the faithful-config default, ops/tile_sparse.py); this
floor rule is a from-scratch-training-only path.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class SparseTensor:
    """Fixed-capacity sparse voxel tensor (analogue of spconv
    SparseConvTensor)."""
    features: jax.Array                       # [N, C]
    coords: jax.Array                         # [N, 4] (b, z, y, x), -1 pad
    spatial_shape: Tuple[int, int, int] = field(metadata=dict(static=True))
    batch_size: int = field(metadata=dict(static=True))

    @property
    def valid(self):
        return self.coords[:, 0] >= 0

    def dense(self):
        """→ [B, C, nz, ny, nx] (ref SparseConvTensor.dense())."""
        from .scatter import voxel_scatter_dense
        nz, ny, nx = self.spatial_shape
        return voxel_scatter_dense(self.features, self.coords,
                                   batch_size=self.batch_size,
                                   nz=nz, ny=ny, nx=nx)


def _linearize(coords, spatial_shape, batch_size):
    # int32 linear ids: B * nz*ny*nx must stay < 2^31 (true for every
    # reference grid: BEVFusion 1440*1440*41*B8 ≈ 6.8e8). Grids past that
    # (the faithful MinkUNet SemanticKITTI grid is 4000*4000*800 = 1.3e10)
    # take the pair-key path — see build_coord_index.
    nz, ny, nx = spatial_shape
    assert batch_size * nz * ny * nx < 2**31 - 1, 'grid too large for int32'
    valid = coords[:, 0] >= 0
    lin = (coords[:, 0] * (nz * ny * nx)
           + coords[:, 1] * (ny * nx) + coords[:, 2] * nx + coords[:, 3])
    BIG = jnp.int32(batch_size * nz * ny * nx)
    return jnp.where(valid, lin, BIG), valid


def _fits_int32(spatial_shape, batch_size):
    nz, ny, nx = spatial_shape
    return batch_size * nz * ny * nx < 2**31 - 1


def _pair_keys(coords, spatial_shape, batch_size):
    """Two int32 lexicographic keys for grids past 2^31 cells:
    ka = ((b*nz + z)*ny + y), kb = x. Invalid rows sort last."""
    nz, ny, nx = spatial_shape
    assert batch_size * nz * ny < 2**31 - 1, 'b*z*y plane > int32'
    valid = coords[:, 0] >= 0
    ka = (coords[:, 0] * nz + coords[:, 1]) * ny + coords[:, 2]
    ka = jnp.where(valid, ka, jnp.int32(batch_size * nz * ny))
    kb = jnp.where(valid, coords[:, 3], jnp.int32(nx))
    return ka, kb, valid


def build_coord_index(coords, spatial_shape, batch_size):
    """Sorted lookup index over a coord table, int32-safe for any grid.

    Small grids (< 2^31 cells): one linear key + argsort — a single
    searchsorted per lookup. Huge grids: lexicographic (ka, kb) sort;
    lookups do TWO searchsorteds via a run-id-compressed combined key
    (run_id * (nx+2) + x fits int32 because run_id <= N_active rows).
    Returns (index, valid)."""
    N = coords.shape[0]
    nz, ny, nx = spatial_shape
    if _fits_int32(spatial_shape, batch_size):
        lin, valid = _linearize(coords, spatial_shape, batch_size)
        order = jnp.argsort(lin)
        return ('lin', order, lin[order], None), valid
    assert N * (nx + 2) < 2**31 - 1, 'active rows * nx > int32'
    ka, kb, valid = _pair_keys(coords, spatial_shape, batch_size)
    ka_s, kb_s, order = jax.lax.sort(
        (ka, kb, jnp.arange(N, dtype=jnp.int32)), num_keys=2)
    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), ka_s[1:] != ka_s[:-1]])
    run_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    comb_s = run_id * jnp.int32(nx + 2) + kb_s
    return ('pair', order, ka_s, (run_id, comb_s)), valid


def lookup_coords(index, query_coords, query_valid, spatial_shape,
                  batch_size, N):
    """Row index of each query coord in the indexed table; (N, False)
    where absent."""
    mode, order, key_s, extra = index
    nz, ny, nx = spatial_shape
    in_grid = jnp.all(
        (query_coords[:, 1:] >= 0)
        & (query_coords[:, 1:] < jnp.asarray([nz, ny, nx])),
        axis=-1) & query_valid
    if mode == 'lin':
        qlin = (query_coords[:, 0] * (nz * ny * nx)
                + query_coords[:, 1] * (ny * nx)
                + query_coords[:, 2] * nx + query_coords[:, 3])
        pos = jnp.clip(jnp.searchsorted(key_s, qlin), 0, N - 1)
        found = in_grid & (key_s[pos] == qlin)
        return jnp.where(found, order[pos], N), found
    run_id, comb_s = extra
    qa = (query_coords[:, 0] * nz + query_coords[:, 1]) * ny \
        + query_coords[:, 2]
    pos_a = jnp.clip(jnp.searchsorted(key_s, qa), 0, N - 1)
    run_found = in_grid & (key_s[pos_a] == qa)
    qcomb = run_id[pos_a] * jnp.int32(nx + 2) + query_coords[:, 3]
    pos = jnp.clip(jnp.searchsorted(comb_s, qcomb), 0, N - 1)
    found = run_found & (comb_s[pos] == qcomb)
    return jnp.where(found, order[pos], N), found


def _sorted_unique_seg(cand, ok, out_shape, batch_size):
    """Sort candidate coords and mark first-of-run rows (the shared
    unique-site step of strided convs), int32-safe for any grid.
    Returns (order, cand_sorted, ok_sorted, new_seg)."""
    onz, ony, onx = out_shape
    M = cand.shape[0]
    if _fits_int32(out_shape, batch_size):
        clin = (cand[:, 0] * (onz * ony * onx)
                + cand[:, 1] * (ony * onx) + cand[:, 2] * onx + cand[:, 3])
        clin = jnp.where(ok, clin, jnp.int32(batch_size * onz * ony * onx))
        order = jnp.argsort(clin)
        clin_s = clin[order]
        adj_diff = clin_s[1:] != clin_s[:-1]
    else:
        ka, kb, _ = _pair_keys(jnp.where(ok[:, None], cand, -1),
                               out_shape, batch_size)
        ka_s, kb_s, order = jax.lax.sort(
            (ka, kb, jnp.arange(M, dtype=jnp.int32)), num_keys=2)
        adj_diff = (ka_s[1:] != ka_s[:-1]) | (kb_s[1:] != kb_s[:-1])
    cand_s = cand[order]
    vs = ok[order]
    new_seg = vs & jnp.concatenate([jnp.ones((1,), bool), adj_diff])
    return order, cand_s, vs, new_seg


def _offsets(kernel_size):
    ks = np.broadcast_to(np.asarray(kernel_size), (3,))
    zz, yy, xx = np.meshgrid(np.arange(ks[0]), np.arange(ks[1]),
                             np.arange(ks[2]), indexing='ij')
    return np.stack([zz.ravel(), yy.ravel(), xx.ravel()], -1)  # [K,3]


def _gather_gemm(features, idx_all, found_all, weight, preferred=jnp.float32):
    """sum_k features[idx_k] @ W_k as ONE im2col GEMM.

    features [N, Cin]; idx_all [K, M]; found_all [K, M]; weight
    [K, Cin, Cout]. M = output row count (may differ from N for strided
    convs with a smaller out_capacity).

    The gathered [M, K·Cin] im2col matrix turns K tiny GEMMs into a single
    [M, K·Cin]×[K·Cin, Cout] MXU GEMM — the contraction dim becomes K·Cin
    (≥432 even at Cin=16), which is what the 128×128 systolic array wants.
    """
    K, M = idx_all.shape
    Cin = features.shape[1]
    Cout = weight.shape[-1]
    feats_pad = jnp.concatenate(
        [features, jnp.zeros((1, Cin), features.dtype)], 0)
    g = feats_pad[idx_all] * found_all[..., None].astype(features.dtype)
    g = jnp.transpose(g, (1, 0, 2)).reshape(M, K * Cin)
    w = weight.reshape(K * Cin, Cout).astype(features.dtype)
    return jnp.dot(g, w, preferred_element_type=preferred)


def build_subm_rulebook(st: SparseTensor, kernel_size=3):
    """Precompute the (idx_all [K,N], found_all [K,N]) neighbor maps for a
    submanifold conv on this coordinate table. SubM convs in the same stage
    share coords, so encoders compute this ONCE per stage and pass it to
    every subm_conv3d (avoids re-running the searchsorted lookups — the
    scalar-heavy part of the op)."""
    offs = _offsets(kernel_size)
    center = (np.broadcast_to(np.asarray(kernel_size), (3,)) - 1) // 2
    deltas = jnp.asarray(offs - center, jnp.int32)
    index, valid = build_coord_index(st.coords, st.spatial_shape,
                                     st.batch_size)
    N = st.coords.shape[0]

    def per_offset(d):
        q = st.coords.at[:, 1:].add(d)
        q = jnp.where(valid[:, None], q, -1)
        return lookup_coords(index, q, valid, st.spatial_shape,
                             st.batch_size, N)

    return jax.vmap(per_offset)(deltas)


def subm_conv3d(st: SparseTensor, weight, bias=None, kernel_size=3,
                rulebook=None):
    """Submanifold sparse conv: output coords == input coords
    (ref spconv SubMConv3d). weight: [K³, Cin, Cout]. ``rulebook``: cached
    (idx_all, found_all) from build_subm_rulebook for this coord table."""
    valid = st.valid
    if rulebook is None:
        rulebook = build_subm_rulebook(st, kernel_size)
    idx_all, found_all = rulebook                           # [K, N]
    out = _gather_gemm(st.features, idx_all, found_all, weight)
    if bias is not None:
        out = out + bias
    out = jnp.where(valid[:, None], out, 0.0)
    return SparseTensor(out.astype(st.features.dtype), st.coords,
                        st.spatial_shape, st.batch_size)


def sparse_conv3d(st: SparseTensor, weight, bias=None, kernel_size=3,
                  stride=2, padding=1, out_capacity=None):
    """Strided sparse conv (ref spconv SparseConv3d).

    Output sites: unique(floor((coord + padding - offset0) / stride)) with
    offset0 chosen so a centered input maps to its natural site (see module
    docstring for the active-set rule). weight: [K³, Cin, Cout].
    """
    ks = np.broadcast_to(np.asarray(kernel_size), (3,))
    strd = np.broadcast_to(np.asarray(stride), (3,))
    pad = np.broadcast_to(np.asarray(padding), (3,))
    nz, ny, nx = st.spatial_shape
    out_shape = tuple(int((np.array([nz, ny, nx])[i] + 2 * pad[i] - ks[i])
                          // strd[i] + 1) for i in range(3))
    N = st.coords.shape[0]
    out_capacity = out_capacity or N
    valid = st.valid

    # candidate output site per input: floor((c + pad - center)/stride)
    center = (ks - 1) // 2
    shift = jnp.asarray(pad - center, jnp.int32)
    strd_j = jnp.asarray(strd, jnp.int32)
    cand = jnp.where(
        valid[:, None],
        jnp.concatenate(
            [st.coords[:, :1],
             jnp.floor_divide(st.coords[:, 1:] + shift, strd_j)], -1),
        -1)
    in_bounds = jnp.all((cand[:, 1:] >= 0)
                        & (cand[:, 1:] < jnp.asarray(out_shape)), -1) & valid
    cand = jnp.where(in_bounds[:, None], cand, -1)

    # unique candidate sites → new coord table (sorted lexicographically)
    _, cand_s, vs, new_seg = _sorted_unique_seg(cand, in_bounds, out_shape,
                                                st.batch_size)
    uidx = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    out_coords = jnp.full((out_capacity, 4), -1, jnp.int32)
    ci = jnp.where(new_seg & (uidx < out_capacity), uidx, out_capacity)
    out_coords = out_coords.at[ci].set(cand_s, mode='drop')
    out_valid = out_coords[:, 0] >= 0

    # gather-GEMM: for each output site, input coord = site*stride - pad + off
    index, _ = build_coord_index(st.coords, st.spatial_shape, st.batch_size)
    offs = jnp.asarray(_offsets(kernel_size), jnp.int32)     # [K, 3]
    pad_j = jnp.asarray(pad, jnp.int32)

    def per_offset(off):
        q_sp = out_coords[:, 1:] * strd_j - pad_j + off
        q = jnp.concatenate([out_coords[:, :1], q_sp], -1)
        q = jnp.where(out_valid[:, None], q, -1)
        return lookup_coords(index, q, out_valid, st.spatial_shape,
                             st.batch_size, N)

    idx_all, found_all = jax.vmap(per_offset)(offs)
    out = _gather_gemm(st.features, idx_all, found_all, weight)
    if bias is not None:
        out = out + bias
    out = jnp.where(out_valid[:, None], out, 0.0)
    return SparseTensor(out.astype(st.features.dtype), out_coords,
                        out_shape, st.batch_size)


def sparse_inverse_conv3d(st: SparseTensor, target_coords, target_valid,
                          target_shape, weight, bias=None, kernel_size=3,
                          stride=2, padding=1):
    """Inverse (transposed) sparse conv onto a KNOWN target coord table
    (ref spconv SparseInverseConv3d — restores the pre-downsample site set
    using the paired forward conv's geometry).

    For fine target site t and kernel offset ``off``, the contributing
    coarse site is s = (t + pad - off) / stride when the division is
    exact: out[t] = Σ_off W[off] · in[s(t, off)]. weight [K³, Cin, Cout].
    """
    ks = np.broadcast_to(np.asarray(kernel_size), (3,))
    strd = np.broadcast_to(np.asarray(stride), (3,))
    pad = np.broadcast_to(np.asarray(padding), (3,))
    N = st.coords.shape[0]
    index, _ = build_coord_index(st.coords, st.spatial_shape, st.batch_size)
    offs = jnp.asarray(_offsets(kernel_size), jnp.int32)     # [K, 3]
    pad_j = jnp.asarray(pad, jnp.int32)
    strd_j = jnp.asarray(strd, jnp.int32)

    def per_offset(off):
        num = target_coords[:, 1:] + pad_j - off
        exact = jnp.all(num % strd_j == 0, -1)
        s_sp = num // strd_j
        ok = exact & target_valid \
            & jnp.all((s_sp >= 0)
                      & (s_sp < jnp.asarray(st.spatial_shape)), -1)
        q = jnp.concatenate([target_coords[:, :1], s_sp], -1)
        q = jnp.where(ok[:, None], q, -1)
        idx, found = lookup_coords(index, q, ok, st.spatial_shape,
                                   st.batch_size, N)
        return idx, found & ok

    idx_all, found_all = jax.vmap(per_offset)(offs)
    out = _gather_gemm(st.features, idx_all, found_all, weight)
    if bias is not None:
        out = out + bias
    out = jnp.where(target_valid[:, None], out, 0.0)
    return SparseTensor(out.astype(st.features.dtype), target_coords,
                        tuple(target_shape), st.batch_size)


@partial(jax.jit, static_argnames=('axis', 'eps'))
def sparse_batch_norm_stats(features, valid, axis=0, eps=1e-5):
    """Masked mean/var over valid rows (BN over active voxels only, matching
    spconv BatchNorm1d-over-features semantics)."""
    w = valid.astype(features.dtype)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(features * w, 0) / n
    var = jnp.sum(w * (features - mean) ** 2, 0) / n
    return mean, var
