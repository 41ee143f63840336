"""Block-sparse (tiled) 3D convolution — the TPU performance-class sparse
conv backend.

Replaces the flat gather-GEMM backend (ops/sparse_conv.py) on the hot path.
The flat backend is semantically exact but does K³·N random ROW gathers per
conv — the TPU anti-pattern (measured ~700 ms for the BEVFusion encoder).
This backend trades bounded overcompute for tile-granular memory movement.

Layout (v5e-measured design, tools/probe_gather_shapes.py):
- Active voxels live in a fixed-capacity table of small dense tiles stored
  FLAT: ``features [T, S·C]`` (cell-major, channel-minor; S = tz·ty·tx) +
  ``mask [T, S]`` + ``tile_coords [T, 4]`` (b, tz, ty, tx; -1 = empty).
  Flat rows are lane-aligned, so table gathers run at ~150 GB/s; shaped
  rows (e.g. ``[2,4,4,16]``) are tile-padded by the gather engine and
  measured 10× slower (14 GB/s).
- A submanifold conv gathers the 26 neighbor rows in ONE flat batched
  gather, assembles the halo as a single lane-slice concat (~780 GB/s),
  and runs ONE ``lax.conv_general_dilated`` over ``[T, tz+2, ty+2, tx+2,
  C]`` — XLA's conv reuses the halo on-chip, avoiding the 27× im2col HBM
  blowup (measured: conv 2.4 ms vs col-GEMM 6.0 ms at stage-1 scale).
- A strided conv builds the OUTPUT tile table directly from per-input-tile
  site-range candidates — there is NO input-table dilation step (the old
  design dilated the input table in place and could overflow its own
  capacity 8×, silently dropping active sites). Each output tile gathers
  its J³ contributor input tiles flat, assembles the receptive-field
  block, and runs one strided VALID conv; the active-set rule is a
  ``reduce_window`` max-pool over the same block's mask.
- All slot bookkeeping runs on dense tile-grid maps (boolean occupancy +
  one cumsum assigns compact linear-id-ordered slots); every lookup is a
  gather off the slot map. No sorts anywhere.

Active-site semantics (ref spconv, projects/SparseConvolution/
sparse_functional.py:19,169 and sparse_conv.py:160-262):
- ``subm``: output sites == input sites (SubMConv3d).
- strided ``rule='floor'``: sites = floor((c + pad - center)/stride) of
  active inputs — bit-identical to ops/sparse_conv.py's documented rule.
- strided ``rule='spconv'``: EXACT spconv receptive-field rule (site
  active iff any active input inside its k-window).

All shapes are static; everything jits and differentiates.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    'TileTensor', 'tiles_from_sparse', 'tiles_to_sparse', 'tile_dense',
    'subm_conv3d_tile', 'sparse_conv3d_tile', 'tile_inverse_conv3d',
    'tile_inverse_conv3d_general', 'tile_gather_voxels', 'auto_tile_shape',
]


def auto_tile_shape(tile_shape, spatial_shape, batch_size):
    """Smallest power-of-two growth of ``tile_shape`` whose tile-grid
    linear id (batch · grid cells) fits int32.

    The sorted index keys tiles by ``b·G + lin`` in int32; on segmentor
    grids (SemanticKITTI 0.05 m = 4000²×800 cells) a (2,4,4) tile gives
    4·10⁸ tile cells/sample, capping batch_size at 5. Rather than
    documenting the footgun (VERDICT r4 weak #3), grow the tile dims
    (z, then y, then x — z grids are shallowest) until any batch fits.
    Tiles are a pure relayout, so this never changes semantics; the
    configured tile CAPACITIES stay sufficient (bigger tiles → fewer
    active tiles).
    """
    t = list(_b3(tile_shape))

    def n_ids():
        g = [-(-int(spatial_shape[i]) // t[i]) for i in range(3)]
        return int(batch_size) * g[0] * g[1] * g[2]

    ax = 0
    while n_ids() >= 2**31 - 1:
        t[ax] *= 2
        ax = (ax + 1) % 3
    return tuple(t)


def _b3(v):
    return tuple(int(x) for x in np.broadcast_to(np.asarray(v), (3,)))


@jax.tree_util.register_dataclass
@dataclass
class TileTensor:
    """Fixed-capacity block-sparse voxel tensor (flat tile rows).

    ``index_mode`` selects the tile-lookup structure held in ``smap``:
    - 'dense': dense linear-id→slot map ``[B·G+1]`` (G = tile-grid
      cells). O(1) lookups, but the map itself is grid-sized — fine for
      detector grids (≤ a few M tiles), prohibitive for segmentor grids
      (SemanticKITTI 0.05 m: 12.8G cells ≈ 50M+ tile slots ≈ 200 MB of
      bookkeeping PER conv output).
    - 'sorted': sorted table of the active tiles' linear ids ``[T]``
      (BIG-padded). Slot i holds the i-th smallest active linear id, so
      a lookup is one ``searchsorted`` (log T gathers) — grid-size
      never materializes. Slot assignment is identical to 'dense'
      (ascending linear id), so both modes build bit-identical tables.
    """
    features: jax.Array                     # [T, S*C] cell-major flat
    mask: jax.Array                         # [T, S] bool
    tile_coords: jax.Array                  # [T, 4] (b, tzi, tyi, txi)
    nb_idx: jax.Array                       # [27, T] neighbor slot (T=none)
    smap: jax.Array                         # dense map | sorted key table
    spatial_shape: Tuple[int, int, int] = field(metadata=dict(static=True))
    batch_size: int = field(metadata=dict(static=True))
    tile_shape: Tuple[int, int, int] = field(metadata=dict(static=True))
    index_mode: str = field(default='dense', metadata=dict(static=True))

    @property
    def S(self):
        return int(np.prod(self.tile_shape))

    @property
    def channels(self):
        return self.features.shape[1] // self.S

    @property
    def valid(self):                        # [T] active tile slots
        return self.tile_coords[:, 0] >= 0

    @property
    def tiles_grid(self):
        t = self.tile_shape
        return tuple(-(-self.spatial_shape[i] // t[i]) for i in range(3))

    def replace_features(self, f):
        return TileTensor(f, self.mask, self.tile_coords, self.nb_idx,
                          self.smap, self.spatial_shape, self.batch_size,
                          self.tile_shape, self.index_mode)


_DIRS = np.stack(np.meshgrid(*([np.arange(-1, 2)] * 3),
                             indexing='ij'), -1).reshape(27, 3)


def _tile_lin(coords, grid, batch_size, valid):
    gz, gy, gx = grid
    lin = (coords[:, 0] * (gz * gy * gx) + coords[:, 1] * (gy * gx)
           + coords[:, 2] * gx + coords[:, 3])
    BIG = jnp.int32(batch_size * gz * gy * gx)
    return jnp.where(valid, lin, BIG), BIG


def _grid_cumsum(x):
    """Occupancy-grid prefix sum. jnp.cumsum (full-window reduce_window)
    is the production impl — A/B'd 39.76 vs 34.79 fps on the v5e against
    lax.associative_scan for the SECOND tile encoder (2026-08-19). But
    reduce_window's HLO flop COUNT is O(n²): 4.4 phantom TFLOP on the
    3M-cell stage-1 grid, poisoning any MFU ledger. The FLOP-counting
    instruments (tools/mfu_report.py, bench.py) therefore trace with
    TPU_BEV3D_CUMSUM_IMPL=assoc — bit-exact int32 adds, O(n log n)
    counted — while production keeps the faster lowering."""
    import os
    if os.environ.get('TPU_BEV3D_CUMSUM_IMPL') == 'assoc':
        return lax.associative_scan(jnp.add, x)
    return jnp.cumsum(x)


def _report_drops(tag, n_active, capacity):
    """Capacity-overflow visibility (advisor r4): with
    TPU_BEV3D_TILE_DEBUG=1, host-print whenever a tile table drops
    active tiles (the drop itself is silent by design — fixed shapes —
    so overruns during training/augmentation would otherwise go
    unnoticed). Checked at call time so tests can toggle the env var."""
    import os
    if os.environ.get('TPU_BEV3D_TILE_DEBUG', '') != '1':
        return

    def cb(n):
        n = int(n)
        if n > capacity:
            print(f'[tile_sparse] {tag}: {n} active > capacity '
                  f'{capacity} — {n - capacity} DROPPED', flush=True)

    jax.debug.callback(cb, n_active)


def _table_from_candidates(cand, ok, grid, batch_size, capacity):
    """Candidate tile coords [M,4] (+validity) → (table [cap,4],
    slot map [B·G+1]).

    Slots are assigned in linear-id order by a cumsum over the dense
    occupancy grid; tiles beyond ``capacity`` drop (lowest linear ids
    survive). The slot map's sentinel row (index B·G) holds ``capacity``
    so invalid lookups read as absent.

    The inverse table is scattered from the M candidate rows, NOT from
    the grid — duplicates write identical coords, so the scatter is
    idempotent. (A dense-grid inverse scatter is 3·10⁶ update rows at
    stage 1 and measured 13 ms/op on v5e; candidates are 10-100x fewer.)
    """
    n = batch_size * int(np.prod(grid))
    lin, BIG = _tile_lin(cand, grid, batch_size, ok)   # BIG == n
    occ = jnp.zeros((n,), bool).at[lin].set(ok, mode='drop')
    _report_drops('dense table', jnp.sum(occ.astype(jnp.int32)), capacity)
    slot = _grid_cumsum(occ.astype(jnp.int32)) - 1     # flat cumsum: 0.9ms
    slot = jnp.where(occ & (slot < capacity), slot, capacity)  # per 3M cells
    smap = jnp.concatenate(
        [slot, jnp.full((1,), capacity, jnp.int32)])
    dest = smap[jnp.where(ok, lin, n)]                 # capacity = dropped
    table = jnp.full((capacity + 1, 4), -1, jnp.int32)
    table = table.at[dest].set(cand, mode='drop')[:capacity]
    # materialize ONCE: without the barrier XLA can fuse this producer
    # chain (incl. the grid cumsum) into every downstream gather
    return lax.optimization_barrier((table, smap))


def _lookup_sorted(key, q, big, absent):
    """Slot lookup on a sorted-key table: position of ``q`` in ``key``
    (ascending, BIG-padded) when present, else ``absent``. Queries equal
    to ``big`` (the invalid sentinel) always miss."""
    pos = jnp.searchsorted(key, q).astype(jnp.int32)
    posc = jnp.minimum(pos, key.shape[0] - 1)
    found = (key[posc] == q) & (q < big)
    return jnp.where(found, posc, absent)


def _table_from_candidates_sorted(cand, ok, grid, batch_size, capacity):
    """Sorted-index twin of ``_table_from_candidates``: candidate tile
    coords [M,4] → (table [cap,4], sorted key table [cap]).

    One M-element sort replaces the grid-sized occupancy cumsum: unique
    candidate linear ids, in ascending order, become slots 0..n-1 —
    the SAME assignment rule as the dense cumsum, so tables from both
    modes are bit-identical (tiles beyond ``capacity`` drop, lowest
    linear ids survive). Nothing here scales with the grid.
    """
    n = batch_size * int(np.prod(grid))
    assert n < 2**31 - 1, \
        f'tile-grid linear id overflows int32 ({n}); use a larger tile_shape'
    lin, BIG = _tile_lin(cand, grid, batch_size, ok)   # BIG == n
    sl = jnp.sort(lin)
    uniq = (sl < BIG) & jnp.concatenate(
        [jnp.ones((1,), bool), sl[1:] != sl[:-1]])
    _report_drops('sorted table', jnp.sum(uniq.astype(jnp.int32)), capacity)
    slot = _grid_cumsum(uniq.astype(jnp.int32)) - 1
    keep = uniq & (slot < capacity)
    key = jnp.full((capacity,), BIG, jnp.int32).at[
        jnp.where(keep, slot, capacity)].set(
        jnp.where(keep, sl, BIG), mode='drop')
    dest = _lookup_sorted(key, lin, BIG, jnp.int32(capacity))
    table = jnp.full((capacity + 1, 4), -1, jnp.int32)
    table = table.at[dest].set(cand, mode='drop')[:capacity]
    return lax.optimization_barrier((table, key))


def _neighbor_table(tile_coords, grid, batch_size, smap,
                    index_mode='dense'):
    """[27, T] slot index of each tile's 27 neighbors (T = absent).

    One batched 27·T gather off the dense slot map ('dense') or one
    27·T searchsorted off the sorted key table ('sorted').
    """
    T = tile_coords.shape[0]
    valid = tile_coords[:, 0] >= 0
    gzyx = jnp.asarray(grid, jnp.int32)
    d = jnp.asarray(_DIRS, jnp.int32)               # [27, 3]
    q_sp = tile_coords[None, :, 1:] + d[:, None]    # [27, T, 3]
    ok = valid[None] & jnp.all((q_sp >= 0) & (q_sp < gzyx), -1)
    gz, gy, gx = grid
    qlin = (tile_coords[None, :, 0] * (gz * gy * gx)
            + q_sp[..., 0] * (gy * gx) + q_sp[..., 1] * gx + q_sp[..., 2])
    n = batch_size * gz * gy * gx
    qlin = jnp.where(ok, qlin, n)
    if index_mode == 'sorted':
        nb = _lookup_sorted(smap, qlin, jnp.int32(n), jnp.int32(T))
    else:
        nb = jnp.minimum(smap[qlin], T).astype(jnp.int32)
    return lax.optimization_barrier(nb)


def _masked_flat(tt: TileTensor, compute_dtype=None):
    """features with invalid cells zeroed, optionally cast ([T, S·C])."""
    C = tt.channels
    f = jnp.where(jnp.repeat(tt.mask, C, axis=1), tt.features, 0)
    if compute_dtype is not None:
        f = f.astype(compute_dtype)
    return f


def tiles_from_sparse(st, tile_shape=(4, 8, 8), capacity: int = 1024,
                      index_mode: str = 'dense'):
    """SparseTensor (ops/sparse_conv.py) → TileTensor.

    Occupancy-grid slot assignment (no argsort; 'dense' mode) or one
    N-row sort ('sorted' mode — grid-size-free, for segmentor-scale
    grids) + a row scatter into the [cap·S, C] cell table, reshaped to
    flat [cap, S·C] rows. Tiles beyond ``capacity`` are dropped
    (first-come in linear-id order), mirroring the voxelizer's overflow
    contract. Both modes produce bit-identical tables.
    """
    tz, ty, tx = _b3(tile_shape)
    nz, ny, nx = st.spatial_shape
    grid = (-(-nz // tz), -(-ny // ty), -(-nx // tx))
    coords = st.coords
    valid = coords[:, 0] >= 0
    tdiv = jnp.asarray([tz, ty, tx], jnp.int32)
    tcoord = jnp.concatenate(
        [coords[:, :1], coords[:, 1:] // tdiv], -1)       # [N, 4]
    cell = jnp.where(valid[:, None], coords[:, 1:] % tdiv, 0)
    lin, BIG = _tile_lin(tcoord, grid, st.batch_size, valid)

    if index_mode == 'sorted':
        tile_coords, smap = _table_from_candidates_sorted(
            tcoord, valid, grid, st.batch_size, capacity)
        slot = _lookup_sorted(smap, lin, BIG, jnp.int32(capacity))
    else:
        tile_coords, smap = _table_from_candidates(
            tcoord, valid, grid, st.batch_size, capacity)
        slot = smap[lin]                      # capacity where dropped

    # voxel → (slot, cell) scatter
    C = st.features.shape[1]
    S = tz * ty * tx
    cell_lin = cell[:, 0] * (ty * tx) + cell[:, 1] * tx + cell[:, 2]
    flat_idx = jnp.where(valid & (slot < capacity),
                         slot * S + cell_lin, capacity * S)
    feats = jnp.zeros((capacity * S + 1, C), st.features.dtype)
    feats = feats.at[flat_idx].set(st.features, mode='drop')
    mask = jnp.zeros((capacity * S + 1,), bool).at[flat_idx].set(
        valid, mode='drop')
    return TileTensor(
        feats[:-1].reshape(capacity, S * C),
        mask[:-1].reshape(capacity, S),
        tile_coords,
        _neighbor_table(tile_coords, grid, st.batch_size,
                        smap if index_mode == 'sorted'
                        else jnp.minimum(smap, capacity), index_mode),
        smap,
        (nz, ny, nx), st.batch_size, (tz, ty, tx), index_mode)


def tiles_to_sparse(tt: TileTensor, capacity: Optional[int] = None):
    """TileTensor → SparseTensor (active rows compacted to the front)."""
    from .sparse_conv import SparseTensor
    T = tt.features.shape[0]
    tz, ty, tx = tt.tile_shape
    S, C = tt.S, tt.channels
    cap = capacity or T * S
    cell = jnp.stack(jnp.meshgrid(jnp.arange(tz), jnp.arange(ty),
                                  jnp.arange(tx), indexing='ij'),
                     -1).reshape(S, 3)                     # [S, 3]
    base = tt.tile_coords[:, None, 1:] * jnp.asarray(
        [tz, ty, tx], jnp.int32) + cell[None]              # [T, S, 3]
    coords = jnp.concatenate(
        [jnp.broadcast_to(tt.tile_coords[:, None, :1], (T, S, 1)), base],
        -1).reshape(T * S, 4)
    m = tt.mask.reshape(T * S)
    coords = jnp.where(m[:, None], coords, -1)
    feats = jnp.where(m[:, None], tt.features.reshape(T * S, C), 0)
    # compact the active rows to the front (sort by ~mask, stable)
    order = jnp.argsort(~m)
    feats, coords = feats[order], coords[order]
    if cap < T * S:
        feats, coords = feats[:cap], coords[:cap]
    elif cap > T * S:
        feats = jnp.concatenate(
            [feats, jnp.zeros((cap - T * S, C), feats.dtype)], 0)
        coords = jnp.concatenate(
            [coords, jnp.full((cap - T * S, 4), -1, jnp.int32)], 0)
    return SparseTensor(feats, coords, tt.spatial_shape, tt.batch_size)


def tile_dense(tt: TileTensor):
    """→ [B, C, nz, ny, nx] (matches SparseTensor.dense()). Tile-granular
    block scatter — the fast path for the encoder's final .dense()."""
    T = tt.features.shape[0]
    tz, ty, tx = tt.tile_shape
    C = tt.channels
    gz, gy, gx = tt.tiles_grid
    nz, ny, nx = tt.spatial_shape
    B = tt.batch_size
    f = _masked_flat(tt).reshape(T, tz, ty, tx, C)
    tc = tt.tile_coords
    ok = tt.valid
    bi = jnp.where(ok, tc[:, 0], B)
    out = jnp.zeros((B + 1, gz, gy, gx, tz, ty, tx, C), f.dtype)
    out = out.at[bi, tc[:, 1], tc[:, 2], tc[:, 3]].set(f, mode='drop')
    out = out[:B].transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        B, gz * tz, gy * ty, gx * tx, C)
    out = out[:, :nz, :ny, :nx]
    return jnp.transpose(out, (0, 4, 1, 2, 3))


def _gather_rows(rows_with_pad, idx):
    """Flat batched row gather; index == nrows-1 must be the zero row."""
    return jnp.take(rows_with_pad, idx.reshape(-1), axis=0)


# 3-spatial conv formulation for the per-tile block convs:
#   'conv3d' (default): one NDHWC lax.conv. MEASURED FASTER than the
#   z-decomposed 2D form at every BEVFusion stage (probe_tile_bevfusion,
#   v5e: subm16 3.46 vs 6.01 ms, down16 9.90 vs 14.63 ms) — consistent
#   with the dense-encoder finding (CLAUDE.md: conv3d 149 vs 221 ms).
#   'zdecomp': kz 2-spatial convs with z folded into batch (A/B knob).
import os as _os
_TILE_CONV = _os.environ.get('TPU_BEV3D_TILE_CONV', 'conv3d')
# min channel width for the run-sliced subm neighbor gather (below it
# the whole-row gather wins; see subm_conv3d_tile)
_RUN_SLICED_MIN_C = int(_os.environ.get('TPU_BEV3D_SUBM_RUNC', '32'))


def _block_conv(x5, wk, strd):
    """[N, Dz, Hy, Wx, C] ⊛ wk [kz,ky,kx,C,Cout], VALID →
    [N, oz, oy, ox, Cout]."""
    if _TILE_CONV == 'conv3d':
        return lax.conv_general_dilated(
            x5, wk, strd, 'VALID',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    N, Dz, Hy, Wx, C = x5.shape
    kz = wk.shape[0]
    Cout = wk.shape[4]
    sz, sy, sx = strd
    oz = (Dz - kz) // sz + 1
    out = None
    for dz in range(kz):
        sl = lax.slice_in_dim(x5, dz, dz + (oz - 1) * sz + 1, stride=sz,
                              axis=1)                  # [N, oz, Hy, Wx, C]
        y = lax.conv_general_dilated(
            sl.reshape(N * oz, Hy, Wx, C), wk[dz], (sy, sx), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        out = y if out is None else out + y
    return out.reshape(N, oz, out.shape[1], out.shape[2], Cout)


def _assemble(pieces, To, dims, C):
    """Lane-slice pieces (cell-major order) → [To, *dims, C]."""
    flat = jnp.concatenate(pieces, axis=1)
    return flat.reshape((To,) + tuple(dims) + (C,))


def subm_conv3d_tile(tt: TileTensor, weight, bias=None, kernel_size=3,
                     compute_dtype=None):
    """Submanifold conv on tiles (output sites == input sites).

    weight [K, Cin, Cout] in the z-major offset order of
    ops/sparse_conv.py._offsets — backends are weight-compatible.
    ``compute_dtype`` (e.g. bfloat16) casts features before the conv
    (f32 accumulation); output keeps the input feature dtype.

    One flat 26-neighbor gather + one lane-slice concat halo + one
    ``lax.conv`` (VALID) per call.
    """
    ks = _b3(kernel_size)
    h = tuple((k - 1) // 2 for k in ks)
    tz, ty, tx = tt.tile_shape
    t3 = (tz, ty, tx)
    T, S, C = tt.features.shape[0], tt.S, tt.channels
    Cout = weight.shape[2]
    f = _masked_flat(tt, compute_dtype)
    if h == (0, 0, 0):
        halo5 = f.reshape(T, tz, ty, tx, C)
    else:
        xp = jnp.concatenate([f, jnp.zeros((1, S * C), f.dtype)], 0)
        # Enumerate the halo cells and group the off-tile ones by source
        # direction. A neighbor contributes only its boundary cells (112
        # of 26·32 for tile (2,4,4)) — gathering whole neighbor rows was
        # 7.4x over-traffic and bounded the op (v5e bisect,
        # tools/probe_subm_parts.py: the 26-row gather alone == the full
        # conv's cost; gathers run ~150 GB/s regardless of row width).
        # Per direction we gather ONLY the needed cells, as contiguous
        # cell-column runs sliced off the table before the row gather —
        # but only at C >= _RUN_SLICED_MIN_C: narrow runs pay the
        # tile-padded-gather penalty instead (measured on v5e: full subm
        # C16 3.5→7.4 ms WORSE, C32 4.8→2.2, C64 9.3→4.5, C128 4.5→1.7 ms).
        run_sliced = C >= _RUN_SLICED_MIN_C
        cells = []
        for z in range(-h[0], tz + h[0]):
            for y in range(-h[1], ty + h[1]):
                for x in range(-h[2], tx + h[2]):
                    d = tuple((0 if 0 <= c < t else (-1 if c < 0 else 1))
                              for c, t in zip((z, y, x), t3))
                    cz, cy, cx = (c - dd * t for c, dd, t
                                  in zip((z, y, x), d, t3))
                    cl = (cz * ty + cy) * tx + cx
                    cells.append((d, cl))
        by_dir = {}
        for d, cl in cells:
            if d != (0, 0, 0):
                by_dir.setdefault(d, set()).add(cl)
        dir_idx = {tuple(dd): i for i, dd in enumerate(_DIRS)}
        piece_src = {}
        for d, cls_ in by_dir.items():
            idx_d = jnp.minimum(tt.nb_idx[dir_idx[d]], T)
            if not run_sliced:
                g = jnp.take(xp, idx_d, axis=0)
                for cl in cls_:
                    piece_src[(d, cl)] = (g, cl)
                continue
            run_start = None
            prev = None
            runs = []
            for cl in sorted(cls_):
                if prev is not None and cl == prev + 1:
                    prev = cl
                    continue
                if run_start is not None:
                    runs.append((run_start, prev))
                run_start = prev = cl
            runs.append((run_start, prev))
            for c0, c1 in runs:
                src = lax.slice_in_dim(xp, c0 * C, (c1 + 1) * C, axis=1)
                g = jnp.take(src, idx_d, axis=0)
                for cl in range(c0, c1 + 1):
                    piece_src[(d, cl)] = (g, cl - c0)
        pieces = []
        for d, cl in cells:
            if d == (0, 0, 0):
                pieces.append(
                    lax.slice_in_dim(f, cl * C, (cl + 1) * C, axis=1))
            else:
                g, off = piece_src[(d, cl)]
                pieces.append(
                    lax.slice_in_dim(g, off * C, (off + 1) * C, axis=1))
        halo5 = _assemble(pieces, T,
                          (tz + 2 * h[0], ty + 2 * h[1], tx + 2 * h[2]), C)
    wk = weight.reshape(ks + (C, Cout)).astype(halo5.dtype)
    # No preferred_element_type=f32: the MXU accumulates bf16 convs in
    # f32 in hardware, the result is rounded to the table dtype right
    # below, and JAX's conv AD rejects mixed-dtype accumulation (the f32
    # cotangent would meet the bf16 weight in the transposed conv).
    out = _block_conv(halo5, wk, (1, 1, 1))
    out = out.astype(tt.features.dtype).reshape(T, S * Cout)
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), S)
    out = jnp.where(jnp.repeat(tt.mask, Cout, axis=1), out, 0)
    return tt.replace_features(out)


def sparse_conv3d_tile(tt: TileTensor, weight, bias=None, kernel_size=3,
                       stride=2, padding=1, out_tile_shape=None,
                       out_capacity: Optional[int] = None,
                       rule: str = 'floor', compute_dtype=None):
    """Strided sparse conv on tiles with re-tiling.

    rule='floor' matches ops/sparse_conv.py's active-set rule exactly;
    rule='spconv' implements the exact spconv receptive-field rule
    (any active input in the k-window activates the site).

    Output-stationary: the output tile table is built directly from
    per-input-tile site-range candidates (no input dilation — the old
    dilation step could overflow the input table capacity 8× and drop
    active sites); each output tile gathers its J³ contributor input
    tiles in one flat gather and runs one strided VALID conv over the
    assembled receptive-field block.
    """
    ks = _b3(kernel_size)
    strd = _b3(stride)
    pad = _b3(padding)
    tz, ty, tx = tt.tile_shape
    t3 = (tz, ty, tx)
    T, S, C = tt.features.shape[0], tt.S, tt.channels
    Cout = weight.shape[2]
    B = tt.batch_size
    out_shape = tuple((tt.spatial_shape[i] + 2 * pad[i] - ks[i])
                      // strd[i] + 1 for i in range(3))
    assert all(n > 0 for n in out_shape), \
        f'conv collapses spatial dim: {tt.spatial_shape} -> {out_shape}'
    ot = _b3(out_tile_shape) if out_tile_shape is not None else t3
    for i in range(3):
        assert (strd[i] * ot[i]) % t3[i] == 0, \
            f'axis {i}: stride·out_tile not a multiple of in tile'
        assert pad[i] <= t3[i], f'axis {i}: padding exceeds tile dim'
    M = tuple(strd[i] * ot[i] // t3[i] for i in range(3))
    center = tuple((k - 1) // 2 for k in ks)
    # contributor in-tile offsets (units of in tiles, rel. to M·q):
    # window in in-cells rel. to out-tile origin = [-pad, s·(ot-1)+k-1-pad]
    jlo = tuple(-((pad[i] + t3[i] - 1) // t3[i]) if pad[i] > 0 else 0
                for i in range(3))
    jhi = tuple((strd[i] * (ot[i] - 1) + ks[i] - 1 - pad[i]) // t3[i]
                for i in range(3))
    J = tuple(jhi[i] - jlo[i] + 1 for i in range(3))
    out_grid = tuple(-(-out_shape[i] // ot[i]) for i in range(3))
    cap = out_capacity or T

    # ---- candidate out tiles from each in-tile's active-site range ----
    tc = tt.tile_coords
    valid = tt.valid
    p = tc[:, 1:]                                       # [T, 3]
    tj = jnp.asarray(t3, jnp.int32)
    sj = jnp.asarray(strd, jnp.int32)
    pj = jnp.asarray(pad, jnp.int32)
    cj = jnp.asarray(center, jnp.int32)
    kj = jnp.asarray(ks, jnp.int32)
    oj = jnp.asarray(ot, jnp.int32)
    c0 = p * tj
    if rule == 'floor':
        o_lo = (c0 + pj - cj) // sj
        o_hi = (c0 + tj - 1 + pj - cj) // sj
        span = tuple((t3[i] - 1) // strd[i] + 1 for i in range(3))
    elif rule == 'spconv':
        o_lo = (c0 + pj - kj + sj) // sj                # ceil((c0+p-k+1)/s)
        o_hi = (c0 + tj - 1 + pj) // sj
        span = tuple((t3[i] - 1 + ks[i] - 1) // strd[i] + 1
                     for i in range(3))
    else:
        raise ValueError(rule)
    o_lo = jnp.maximum(o_lo, 0)
    o_hi = jnp.minimum(o_hi, jnp.asarray(out_shape, jnp.int32) - 1)
    q_lo = o_lo // oj
    q_hi = o_hi // oj
    nd = tuple((span[i] + ot[i] - 2) // ot[i] + 1 for i in range(3))
    deltas = np.stack(np.meshgrid(*[np.arange(n) for n in nd],
                                  indexing='ij'), -1).reshape(-1, 3)
    Dn = len(deltas)
    q = q_lo[None] + jnp.asarray(deltas, jnp.int32)[:, None]   # [Dn, T, 3]
    okc = (valid[None] & jnp.all(q <= q_hi[None], -1)
           & jnp.all(q < jnp.asarray(out_grid, jnp.int32), -1))
    cand = jnp.concatenate(
        [jnp.broadcast_to(tc[None, :, :1], (Dn, T, 1)), q],
        -1).reshape(Dn * T, 4)
    build = (_table_from_candidates_sorted if tt.index_mode == 'sorted'
             else _table_from_candidates)
    out_coords, out_smap = build(cand, okc.reshape(-1), out_grid, B, cap)

    # ---- gather contributor tiles & assemble receptive-field block ----
    grid_in = tt.tiles_grid
    joffs = np.stack(np.meshgrid(*[np.arange(jlo[i], jhi[i] + 1)
                                   for i in range(3)],
                                 indexing='ij'), -1).reshape(-1, 3)
    J3 = len(joffs)
    oc = out_coords
    ovalid = oc[:, 0] >= 0
    base = oc[:, 1:] * jnp.asarray(M, jnp.int32)        # [cap, 3]
    ctrc = base[None] + jnp.asarray(joffs, jnp.int32)[:, None]  # [J3,cap,3]
    okj = (ovalid[None]
           & jnp.all((ctrc >= 0)
                     & (ctrc < jnp.asarray(grid_in, jnp.int32)), -1))
    giz, giy, gix = grid_in
    clin = (oc[None, :, 0] * (giz * giy * gix) + ctrc[..., 0] * (giy * gix)
            + ctrc[..., 1] * gix + ctrc[..., 2])
    n_in = B * giz * giy * gix
    clin = jnp.where(okj, clin, n_in)
    if tt.index_mode == 'sorted':
        slots = _lookup_sorted(tt.smap, clin, jnp.int32(n_in),
                               jnp.int32(T))             # [J3, cap]; T=zero
    else:
        slots = jnp.minimum(tt.smap[clin], T)           # [J3, cap]; T=zero

    f = _masked_flat(tt, compute_dtype)
    xp = jnp.concatenate([f, jnp.zeros((1, S * C), f.dtype)], 0)
    mp = jnp.concatenate([tt.mask, jnp.zeros((1, S), bool)], 0)
    mrows = _gather_rows(mp, slots).reshape(J3, cap, S)

    b3 = tuple(J[i] * t3[i] for i in range(3))          # block dims
    # mask block: whole-row gather + one transpose (bool rows are tiny)
    mblock = jnp.transpose(
        mrows.reshape(J + (cap, tz, ty, tx)),
        (3, 0, 4, 1, 5, 2, 6)).reshape((cap,) + b3)

    # ---- value window assembled DIRECTLY from per-contributor gathers.
    # The old path gathered all J³ full contributor rows (2048 cells at
    # stage-1 geometry), transposed them into the [cap, J·t] block, and
    # sliced the conv window (405 cells) out — ~5x gather+materialize
    # over-traffic, and the gather bounds the op (~150 GB/s engine; see
    # the subm note). Here each window cell maps statically to a
    # (contributor tile, cell) pair; per contributor we gather only the
    # needed cell-column runs (width-gated like subm), and the window is
    # one lane-slice concat with x-runs merged (~135 operands).
    wlen = tuple(strd[i] * (ot[i] - 1) + ks[i] for i in range(3))

    def _cell_of(w, i):
        a = w - pad[i]
        jo = a // t3[i]
        return jo, a - jo * t3[i]

    need_by_j = {}
    wcells = []
    for wz in range(wlen[0]):
        jz, cz = _cell_of(wz, 0)
        for wy in range(wlen[1]):
            jy, cy = _cell_of(wy, 1)
            for wx in range(wlen[2]):
                jx, cx = _cell_of(wx, 2)
                jj = (jz, jy, jx)
                cl = (cz * ty + cy) * tx + cx
                wcells.append((jj, cl))
                need_by_j.setdefault(jj, set()).add(cl)
    jindex = {tuple(j): i for i, j in enumerate(joffs)}
    run_sliced = C >= _RUN_SLICED_MIN_C
    gsrc = {}
    for jj, cls_ in need_by_j.items():
        sl_j = slots[jindex[jj]]
        if not run_sliced or len(cls_) == S:
            g = jnp.take(xp, sl_j, axis=0)
            for cl in cls_:
                gsrc[(jj, cl)] = (g, cl)
            continue
        run_start = prev = None
        runs = []
        for cl in sorted(cls_):
            if prev is not None and cl == prev + 1:
                prev = cl
                continue
            if run_start is not None:
                runs.append((run_start, prev))
            run_start = prev = cl
        runs.append((run_start, prev))
        for c0, c1 in runs:
            g = jnp.take(lax.slice_in_dim(xp, c0 * C, (c1 + 1) * C,
                                          axis=1), sl_j, axis=0)
            for cl in range(c0, c1 + 1):
                gsrc[(jj, cl)] = (g, cl - c0)
    pieces = []
    run = None                        # (g, off, length) of the open run
    for jj, cl in wcells:
        g, o = gsrc[(jj, cl)]
        if run is not None and run[0] is g and o == run[1] + run[2]:
            run = (g, run[1], run[2] + 1)
            continue
        if run is not None:
            pieces.append(lax.slice_in_dim(
                run[0], run[1] * C, (run[1] + run[2]) * C, axis=1))
        run = (g, o, 1)
    pieces.append(lax.slice_in_dim(
        run[0], run[1] * C, (run[1] + run[2]) * C, axis=1))
    vwin = _assemble(pieces, cap, wlen, C)
    wk = weight.reshape(ks + (C, Cout)).astype(vwin.dtype)
    # no preferred_element_type: see the subm conv note (AD-compatible;
    # MXU accumulates bf16 in f32 regardless)
    region = _block_conv(vwin, wk, strd).astype(tt.features.dtype)
    if bias is not None:
        region = region + bias.astype(region.dtype)

    # ---- active-set rule: max-pool over the block mask ----
    off = tuple(-pad[i] - jlo[i] * t3[i] for i in range(3))   # window in block
    if rule == 'floor':
        moff = tuple(center[i] - pad[i] - jlo[i] * t3[i] for i in range(3))
        mwin = strd
    else:
        moff = off
        mwin = ks
    assert all(m >= 0 for m in moff)
    mlen = tuple(strd[i] * (ot[i] - 1) + mwin[i] for i in range(3))
    assert all(moff[i] + mlen[i] <= b3[i] for i in range(3))
    mwin_sl = lax.slice(mblock.astype(jnp.int32), (0,) + moff,
                        (cap, moff[0] + mlen[0], moff[1] + mlen[1],
                         moff[2] + mlen[2]))
    rmask = lax.reduce_window(mwin_sl, 0, lax.max,
                              (1,) + mwin, (1,) + strd, 'VALID') > 0
    # clip to the global out grid
    for i, n in enumerate(out_shape):
        gbase = oc[:, 1 + i] * ot[i]
        loc = lax.broadcasted_iota(jnp.int32, rmask.shape, 1 + i)
        rmask = rmask & ((gbase.reshape((cap, 1, 1, 1)) + loc) < n)
    rmask = rmask & ovalid.reshape((cap, 1, 1, 1))

    S_out = int(np.prod(ot))
    rmask_f = rmask.reshape(cap, S_out)
    out = region.reshape(cap, S_out * Cout)
    out = jnp.where(jnp.repeat(rmask_f, Cout, axis=1), out, 0)
    return TileTensor(
        out, rmask_f, out_coords,
        _neighbor_table(out_coords, out_grid, B, out_smap, tt.index_mode),
        out_smap, out_shape, B, ot, tt.index_mode)


def tile_gather_voxels(tt: TileTensor, coords):
    """Per-voxel feature rows from a TileTensor: for each query coord
    [N, 4] (b, z, y, x; b < 0 = invalid) return its feature row [N, C]
    (zeros when the cell is absent/masked). The segmentors' point-head
    path: decoder output lives on the full-res tile table; the original
    voxel rows are recovered by one tile lookup + one cell gather.
    """
    tz, ty, tx = tt.tile_shape
    T, S, C = tt.features.shape[0], tt.S, tt.channels
    grid = tt.tiles_grid
    valid = coords[:, 0] >= 0
    tdiv = jnp.asarray([tz, ty, tx], jnp.int32)
    tcoord = jnp.concatenate(
        [coords[:, :1], coords[:, 1:] // tdiv], -1)
    cell = jnp.where(valid[:, None], coords[:, 1:] % tdiv, 0)
    lin, BIG = _tile_lin(tcoord, grid, tt.batch_size, valid)
    if tt.index_mode == 'sorted':
        slot = _lookup_sorted(tt.smap, lin, BIG, jnp.int32(T))
    else:
        slot = jnp.minimum(tt.smap[lin], T)
    cell_lin = cell[:, 0] * (ty * tx) + cell[:, 1] * tx + cell[:, 2]
    f = _masked_flat(tt).reshape(T, S, C)
    fp = jnp.concatenate([f, jnp.zeros((1, S, C), f.dtype)], 0)
    rows = fp[slot, cell_lin]                            # [N, C]
    return jnp.where(valid[:, None], rows, 0)


def tile_inverse_conv3d_general(tt: TileTensor, target: TileTensor,
                                weight, kernel_size=3, stride=1,
                                padding=1, compute_dtype=None):
    """Inverse (transposed) sparse conv onto a KNOWN target tile table —
    GENERAL geometry: any kernel k, stride s ∈ {1, 2} with
    ``target.tile_shape % s == 0``, any padding, and in/out tile shapes
    may differ (ref spconv SparseInverseConv3d with arbitrary k — the
    Part-A2 SparseUNet decoder's k3 upsamples,
    mmdet3d/models/middle_encoders/sparse_unet.py:250-276; flat twin
    ops/sparse_conv.py sparse_inverse_conv3d).

    Semantics: forward conv maps fine c → coarse o where
    ``o·s - p + d == c`` (d ∈ [0,k)³); the inverse writes
    ``out[c] = Σ in[o]·W[d]`` over those pairs, masked to the target's
    recorded active sites (no active-set rule — the table is given).

    Tile formulation: per fine tile (origin C0 = q·t_f, t_f % s == 0 so
    the window geometry is tile-invariant) gather the J³ contributor
    coarse tiles, assemble the coarse window, and run ONE
    ``lhs_dilation=s`` conv with the spatially REVERSED kernel — the
    standard transposed-conv identity — then statically slice the t_f
    region. The per-tile window offset inside the gathered block is
    dynamic (coarse tiles don't align with fine windows); it is applied
    with one one-hot select einsum per axis.
    """
    ks = _b3(kernel_size)
    strd = _b3(stride)
    pad = _b3(padding)
    assert all(s in (1, 2) for s in strd), strd
    assert all(k >= s for k, s in zip(ks, strd))
    tf = target.tile_shape
    tc = tt.tile_shape
    assert all(tf[i] % strd[i] == 0 for i in range(3)), (tf, strd)
    T, Sc, C = tt.features.shape[0], tt.S, tt.channels
    Cout = weight.shape[2]
    To = target.features.shape[0]
    grid_c = tt.tiles_grid
    B = tt.batch_size

    # per-axis window geometry (constants given tf % s == 0)
    A = tuple((pad[i] - ks[i] + strd[i]) // strd[i] for i in range(3))
    # O0 = C0/s + A ; O1 = (C0 + tf-1+p)/s ; WL = O1 - O0 + 1
    WL = tuple((tf[i] - 1 + pad[i]) // strd[i] - A[i] + 1
               for i in range(3))
    J = tuple((WL[i] + tc[i] - 2) // tc[i] + 1 for i in range(3))

    # ---- contributor coarse tiles per fine tile -----------------------
    oc = target.tile_coords
    ovalid = target.valid
    C0 = oc[:, 1:] * jnp.asarray(tf, jnp.int32)              # [To, 3]
    O0 = C0 // jnp.asarray(strd, jnp.int32) + jnp.asarray(A, jnp.int32)
    jb = jnp.where(ovalid[:, None],
                   O0 // jnp.asarray(tc, jnp.int32), 0)      # base tile
    off = jnp.where(ovalid[:, None],
                    O0 - jb * jnp.asarray(tc, jnp.int32), 0)  # [To,3] ≥0
    joffs = np.stack(np.meshgrid(*[np.arange(J[i]) for i in range(3)],
                                 indexing='ij'), -1).reshape(-1, 3)
    J3 = len(joffs)
    ctrc = jb[None] + jnp.asarray(joffs, jnp.int32)[:, None]  # [J3,To,3]
    okj = (ovalid[None]
           & jnp.all((ctrc >= 0)
                     & (ctrc < jnp.asarray(grid_c, jnp.int32)), -1))
    gz, gy, gx = grid_c
    clin = (oc[None, :, 0] * (gz * gy * gx) + ctrc[..., 0] * (gy * gx)
            + ctrc[..., 1] * gx + ctrc[..., 2])
    n_in = B * gz * gy * gx
    clin = jnp.where(okj, clin, n_in)
    if tt.index_mode == 'sorted':
        slots = _lookup_sorted(tt.smap, clin, jnp.int32(n_in),
                               jnp.int32(T))
    else:
        slots = jnp.minimum(tt.smap[clin], T)

    f = _masked_flat(tt, compute_dtype)
    xp = jnp.concatenate([f, jnp.zeros((1, Sc * C), f.dtype)], 0)
    rows = _gather_rows(xp, slots)                       # [J3·To, Sc·C]
    block = rows.reshape(J + (To,) + tc + (C,))
    block = jnp.transpose(block, (3, 0, 4, 1, 5, 2, 6, 7)).reshape(
        (To,) + tuple(J[i] * tc[i] for i in range(3)) + (C,))

    # ---- per-tile dynamic window select (one-hot einsum per axis) ----
    # NOT take_along_axis: a broadcast-index take on a middle axis lowers
    # to a per-element general gather — measured 2313 ms vs 10 ms for the
    # equivalent one-hot batched matmul at Part-A2 inv s2→s1 sizing
    # (tools/probe_inv_conv_parts.py, v5e 2026-08-20). The select matrix
    # is [To, WL, L] with L = J·tc ≤ 8 — a tiny per-tile GEMM the MXU
    # batches over To.
    # precision: the select is a 0/1 permutation matmul — exact as long
    # as the inputs are not rounded. TPU default matmul rounds f32
    # inputs to bf16 (measured rel err 4e-3); HIGHEST keeps f32 inputs
    # bit-exact through the select. bf16 inputs need no upgrade.
    # Layout: contract with the select axis moved to position 1 and the
    # remaining axes FLATTENED into one large minor ('twl,tlr->twr') —
    # selecting on a trailing tiny axis padded [To,...,32,2] tiles 4×
    # and OOM'd the Part-A2 bs=6 train backward (6 GB for one select
    # cotangent).
    prec = (lax.Precision.HIGHEST if block.dtype == jnp.float32
            else lax.Precision.DEFAULT)
    for ax in range(3):
        L = block.shape[1 + ax]
        sel = (off[:, ax, None, None] + jnp.arange(WL[ax])[None, :, None]
               == jnp.arange(L)[None, None, :]).astype(block.dtype)
        moved = jnp.moveaxis(block, 1 + ax, 1)
        rest = moved.shape[2:]
        flat = moved.reshape(To, L, -1)
        out = jnp.einsum('twl,tlr->twr', sel, flat, precision=prec)
        block = jnp.moveaxis(
            out.reshape((To, WL[ax]) + rest), 1, 1 + ax)

    # ---- transposed conv: reversed kernel + lhs_dilation -------------
    wk = weight.reshape(ks + (C, Cout))[::-1, ::-1, ::-1].astype(
        block.dtype)
    # out[j] ↦ fine c = O0·s + j + (k-1) - p ; want j ∈ [jst, jst+tf)
    jst = tuple(-A[i] * strd[i] - ks[i] + 1 + pad[i] for i in range(3))
    pad_lo = tuple(max(0, -jst[i]) for i in range(3))
    out_len = tuple(strd[i] * (WL[i] - 1) + 1 + pad_lo[i] - ks[i] + 1
                    for i in range(3))
    pad_hi = tuple(max(0, jst[i] + pad_lo[i] + tf[i] - out_len[i])
                   for i in range(3))
    y = lax.conv_general_dilated(
        block, wk, (1, 1, 1),
        padding=tuple((pad_lo[i], pad_hi[i]) for i in range(3)),
        lhs_dilation=strd,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    y = lax.slice(y, (0,) + tuple(jst[i] + pad_lo[i] for i in range(3))
                  + (0,),
                  (To,) + tuple(jst[i] + pad_lo[i] + tf[i]
                                for i in range(3)) + (Cout,))
    out = y.astype(tt.features.dtype).reshape(To, -1)
    out = jnp.where(jnp.repeat(target.mask, Cout, axis=1), out, 0)
    return target.replace_features(out)


def tile_inverse_conv3d(tt: TileTensor, target: TileTensor, weight,
                        bias=None, kernel_size=2, stride=2,
                        compute_dtype=None):
    """Inverse (transposed) sparse conv onto a KNOWN target tile table
    (ref spconv SparseInverseConv3d; flat twin:
    ops/sparse_conv.py:305 sparse_inverse_conv3d). Restricted to the
    UNet-decoder geometry k == stride, padding 0 (MinkUNet's k2-s2
    upsamples, ref mmdet3d minkunet_backbone.py decoder): the strided
    windows then PARTITION the fine grid, so every fine cell c has
    exactly one contributor coarse cell c//s with kernel offset c%s.

    Tile formulation (tile dims divisible by s, same tile shape both
    sides): fine tile q reads exactly ONE coarse tile q//s; the parent
    sub-block is a per-axis half-select by the tile parity q%s (static
    slices + one where — no gather), and the kernel offset of a fine
    cell is cell%s — STATIC, so the 8 offset GEMMs batch into one
    einsum and interleave. weight [K, Cin, Cout] in the z-major offset
    order of ops/sparse_conv.py._offsets (backends weight-compatible).
    """
    ks = _b3(kernel_size)
    strd = _b3(stride)
    assert ks == strd and all(s in (1, 2) for s in strd), \
        f'tile inverse conv needs k == stride in {{1,2}}, got {ks}/{strd}'
    t3 = tt.tile_shape
    assert target.tile_shape == t3, 'in/out tile shapes must match'
    assert all(t3[i] % strd[i] == 0 for i in range(3))
    tz, ty, tx = t3
    T, S, C = tt.features.shape[0], tt.S, tt.channels
    Cout = weight.shape[2]
    grid_in = tt.tiles_grid
    sj = jnp.asarray(strd, jnp.int32)

    # parent tile lookup (one per fine tile)
    tc = target.tile_coords
    ok = target.valid
    pq = jnp.concatenate([tc[:, :1], tc[:, 1:] // sj], -1)
    par = jnp.where(ok[:, None], tc[:, 1:] % sj, 0)      # [To, 3] parity
    lin, BIG = _tile_lin(pq, grid_in, tt.batch_size, ok)
    if tt.index_mode == 'sorted':
        slot = _lookup_sorted(tt.smap, lin, BIG, jnp.int32(T))
    else:
        slot = jnp.minimum(tt.smap[lin], T)

    f = _masked_flat(tt, compute_dtype)
    xp = jnp.concatenate([f, jnp.zeros((1, S * C), f.dtype)], 0)
    To = tc.shape[0]
    block = jnp.take(xp, slot, axis=0).reshape(To, tz, ty, tx, C)

    # per-axis parity half-select → parent sub-block [To, hz, hy, hx, C]
    for ax in range(3):
        if strd[ax] == 1:
            continue
        h = t3[ax] // 2
        lo = lax.slice_in_dim(block, 0, h, axis=1 + ax)
        hi = lax.slice_in_dim(block, h, 2 * h, axis=1 + ax)
        p = par[:, ax].reshape((To,) + (1,) * 4)
        block = jnp.where(p > 0, hi, lo)
    hz, hy, hx = block.shape[1:4]

    # all k offsets in one einsum; out[s·i+a, s·j+b, s·k+c] = sub@W[abc]
    wk = weight.reshape(ks + (C, Cout)).astype(block.dtype)
    y = jnp.einsum('tzyxc,abkcd->tzaybxkd', block, wk)
    out = y.reshape(To, hz * ks[0], hy * ks[1], hx * ks[2], Cout)
    out = out.astype(tt.features.dtype).reshape(To, -1)
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype),
                             int(np.prod(t3)))
    out = jnp.where(jnp.repeat(target.mask, Cout, axis=1), out, 0)
    return target.replace_features(out)
