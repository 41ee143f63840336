"""Block-sparse (tiled) 3D convolution — the TPU performance-class sparse
conv backend.

Replaces the flat gather-GEMM backend (ops/sparse_conv.py) on the hot path.
The flat backend is semantically exact but does K³·N random ROW gathers per
conv — the TPU anti-pattern (measured ~700 ms for the BEVFusion encoder).
This backend trades bounded overcompute for tile-granular memory movement:

- Active voxels are stored as a fixed-capacity table of small DENSE tiles:
  ``features [T, tz, ty, tx, C]`` + ``mask [T, tz, ty, tx]`` +
  ``tile_coords [T, 4]`` (b, tile_z, tile_y, tile_x; -1 = empty slot),
  sorted by linearized tile id.
- A conv gathers each tile's 26 neighbors ONCE per conv at tile/face
  granularity (large contiguous copies, not per-row gathers) into a haloed
  block ``[T, tz+2h, ...]``, then runs the convolution as K dense
  [T·S, Cin]×[Cin, Cout] MXU GEMMs over statically-shifted views (or one
  im2col GEMM). Sparsity shows up only as the masked cells inside active
  tiles (overcompute = 1/tile-occupancy, typically 3-10x — dense-rate FLOPs
  that the MXU shrugs off, vs the 100x latency of row gathers).
- Downsampling re-tiles: stride-s output regions of s³ parent tiles merge
  into one output tile by a tile-granular scatter.

All slot bookkeeping runs on DENSE TILE-GRID MAPS, not sorts: the tile
grid is small (≤ ~7·10⁵ cells at stage 1, shrinking 4-8x per stage), so a
boolean occupancy grid + one cumsum assigns compact, linear-id-ordered
slots, and every lookup (neighbor table, dilation, re-tile destination) is
a single dense gather. v5e probe: the original argsort/searchsorted
machinery put the strided conv at 56 ms/op; the grid-map version removes
all of it from the critical path.

Active-site semantics (ref spconv, projects/SparseConvolution/
sparse_functional.py:19,169 and sparse_conv.py:160-262):
- ``subm``: output sites == input sites (SubMConv3d).
- strided ``rule='floor'``: sites = floor((c + pad - center)/stride) of
  active inputs — bit-identical to ops/sparse_conv.py's documented rule.
- strided ``rule='spconv'``: EXACT spconv receptive-field rule (site active
  iff any active input inside its k-window), computed by pooling the haloed
  mask — the tile layout makes the exact rule as cheap as the floor rule,
  closing the flat backend's documented deviation. Needs a one-tile
  positive-direction dilation of the tile table (boundary inputs activate
  sites in the next parent tile's region).

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
    'subm_conv3d_tile', 'sparse_conv3d_tile',
]


def _b3(v):
    return tuple(int(x) for x in np.broadcast_to(np.asarray(v), (3,)))


@jax.tree_util.register_dataclass
@dataclass
class TileTensor:
    """Fixed-capacity block-sparse voxel tensor."""
    features: jax.Array                     # [T, tz, ty, tx, C]
    mask: jax.Array                         # [T, tz, ty, tx] bool
    tile_coords: jax.Array                  # [T, 4] (b, tzi, tyi, txi)
    nb_idx: jax.Array                       # [27, T] neighbor slot (T=none)
    spatial_shape: Tuple[int, int, int] = field(metadata=dict(static=True))
    batch_size: int = field(metadata=dict(static=True))

    @property
    def tile_shape(self):
        return tuple(self.features.shape[1:4])

    @property
    def valid(self):                        # [T] active tile slots
        return self.tile_coords[:, 0] >= 0

    @property
    def tiles_grid(self):
        t = self.tile_shape
        return tuple(-(-self.spatial_shape[i] // t[i]) for i in range(3))


_DIRS = np.stack(np.meshgrid(*([np.arange(-1, 2)] * 3),
                             indexing='ij'), -1).reshape(27, 3)


def _tile_lin(coords, grid, batch_size, valid):
    gz, gy, gx = grid
    lin = (coords[:, 0] * (gz * gy * gx) + coords[:, 1] * (gy * gx)
           + coords[:, 2] * gx + coords[:, 3])
    BIG = jnp.int32(batch_size * gz * gy * gx)
    return jnp.where(valid, lin, BIG), BIG


def _slot_lookup(tile_coords, grid, batch_size):
    """Dense lin→slot map [B·G + 1] for an EXISTING table (T = absent).

    One T-row scatter; the sentinel row (index B·G, where invalid linear
    ids land) stays T.
    """
    T = tile_coords.shape[0]
    valid = tile_coords[:, 0] >= 0
    n = batch_size * int(np.prod(grid))
    lin, _ = _tile_lin(tile_coords, grid, batch_size, valid)
    idx = jnp.where(valid, lin, n + 1)          # out of bounds → dropped
    smap = jnp.full((n + 1,), T, jnp.int32)
    return smap.at[idx].set(jnp.arange(T, dtype=jnp.int32), mode='drop')


def _table_from_occ(occ, grid, batch_size, capacity):
    """Occupancy grid [B·G] bool → (tile_coords [cap,4], slot map [B·G+1]).

    Slots are assigned in linear-id order by a cumsum over the grid (the
    same order the old argsort produced); tiles beyond ``capacity`` drop
    (lowest linear ids survive). The slot map's sentinel row (index B·G)
    holds ``capacity`` so invalid lookups read as absent.
    """
    G = int(np.prod(grid))
    n = batch_size * G
    gz, gy, gx = grid
    slot = jnp.cumsum(occ.astype(jnp.int32)) - 1
    slot = jnp.where(occ & (slot < capacity), slot, capacity)
    g = jnp.arange(n, dtype=jnp.int32)
    b = g // G
    r = g % G
    coords = jnp.stack([b, r // (gy * gx), (r // gx) % gy, r % gx], -1)
    table = jnp.full((capacity + 1, 4), -1, jnp.int32)
    table = table.at[slot].set(coords, mode='drop')[:capacity]
    smap = jnp.concatenate(
        [slot, jnp.full((1,), capacity, jnp.int32)])
    return table, smap


def _neighbor_table(tile_coords, grid, batch_size, smap=None):
    """[27, T] slot index of each tile's 27 neighbors (T = absent).

    Dense grid-map lookup: one [27·T] gather off the slot map — no sorts.
    """
    T = tile_coords.shape[0]
    valid = tile_coords[:, 0] >= 0
    if smap is None:
        smap = _slot_lookup(tile_coords, grid, batch_size)
    gzyx = jnp.asarray(grid, jnp.int32)

    def per_dir(d):
        q_sp = tile_coords[:, 1:] + d
        ok = valid & jnp.all((q_sp >= 0) & (q_sp < gzyx), -1)
        q = jnp.concatenate([tile_coords[:, :1], q_sp], -1)
        qlin, BIG = _tile_lin(q, grid, batch_size, ok)
        nb = smap[qlin]
        return jnp.minimum(nb, T).astype(jnp.int32)

    return jax.vmap(per_dir)(jnp.asarray(_DIRS, jnp.int32))


def tiles_from_sparse(st, tile_shape=(4, 8, 8), capacity: int = 1024):
    """SparseTensor (ops/sparse_conv.py) → TileTensor.

    Occupancy-grid slot assignment (no argsort) + a tile-granular scatter.
    Tiles beyond ``capacity`` are dropped (first-come in linear-id order),
    mirroring the voxelizer's overflow contract.
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

    n = st.batch_size * int(np.prod(grid))
    occ = jnp.zeros((n,), bool).at[lin].set(valid, mode='drop')
    tile_coords, smap = _table_from_occ(occ, grid, st.batch_size, capacity)

    # voxel → (slot, cell) scatter
    C = st.features.shape[1]
    S = tz * ty * tx
    slot = smap[lin]                          # capacity where dropped
    cell_lin = cell[:, 0] * (ty * tx) + cell[:, 1] * tx + cell[:, 2]
    flat_idx = jnp.where(valid & (slot < capacity),
                         slot * S + cell_lin, capacity * S)
    feats = jnp.zeros((capacity * S + 1, C), st.features.dtype)
    feats = feats.at[flat_idx].set(st.features, mode='drop')
    mask = jnp.zeros((capacity * S + 1,), bool).at[flat_idx].set(
        valid, mode='drop')
    return TileTensor(
        feats[:-1].reshape(capacity, tz, ty, tx, C),
        mask[:-1].reshape(capacity, tz, ty, tx),
        tile_coords,
        _neighbor_table(tile_coords, grid, st.batch_size,
                        jnp.minimum(smap, capacity)),
        (nz, ny, nx), st.batch_size)


def tiles_to_sparse(tt: TileTensor, capacity: Optional[int] = None):
    """TileTensor → SparseTensor, rows in tile-major order (active cells
    first within each tile slot's S-block? No — fixed layout: slot-major,
    cell-minor with invalid rows carrying coord -1)."""
    from .sparse_conv import SparseTensor
    T, tz, ty, tx, C = tt.features.shape
    S = tz * ty * tx
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
    T, tz, ty, tx, C = tt.features.shape
    gz, gy, gx = tt.tiles_grid
    nz, ny, nx = tt.spatial_shape
    B = tt.batch_size
    f = jnp.where(tt.mask[..., None], tt.features, 0)
    tc = tt.tile_coords
    ok = tt.valid
    bi = jnp.where(ok, tc[:, 0], B)
    out = jnp.zeros((B + 1, gz, gy, gx, tz, ty, tx, C), f.dtype)
    out = out.at[bi, tc[:, 1], tc[:, 2], tc[:, 3]].set(f, mode='drop')
    out = out[:B].transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        B, gz * tz, gy * ty, gx * tx, C)
    out = out[:, :nz, :ny, :nx]
    return jnp.transpose(out, (0, 4, 1, 2, 3))


def _build_halo(x, nb_idx, h):
    """x [T, tz, ty, tx, ...] → haloed [T, tz+2hz, ty+2hy, tx+2hx, ...].

    Concat-assembled: the halo is built as a nested z/y/x concatenation of
    the center tile and 26 pre-sliced neighbor faces/edges/corners, so
    every byte is written exactly once (the old scatter assembly re-copied
    the halo buffer per direction). Traffic ≈ 2× the halo volume.
    """
    tz, ty, tx = x.shape[1:4]
    hz, hy, hx = h
    if hz == hy == hx == 0:
        return x
    zero_row = jnp.zeros((1,) + x.shape[1:], x.dtype)
    xp_ = jnp.concatenate([x, zero_row], 0)
    dir_index = {tuple(d): i for i, d in enumerate(_DIRS)}

    def sel(d, t, hh):      # source slice in the neighbor tile
        if d == 0:
            return slice(0, t)
        return slice(0, hh) if d > 0 else slice(t - hh, t)

    z_parts = []
    for dz in (-1, 0, 1):
        if dz != 0 and hz == 0:
            continue
        y_parts = []
        for dy in (-1, 0, 1):
            if dy != 0 and hy == 0:
                continue
            x_parts = []
            for dx in (-1, 0, 1):
                if dx != 0 and hx == 0:
                    continue
                if (dz, dy, dx) == (0, 0, 0):
                    x_parts.append(x)
                    continue
                di = dir_index[(dz, dy, dx)]
                src = xp_[:, sel(dz, tz, hz), sel(dy, ty, hy),
                          sel(dx, tx, hx)]
                x_parts.append(jnp.take(src, nb_idx[di], axis=0,
                                        mode='clip'))   # T → zero row
            y_parts.append(x_parts[0] if len(x_parts) == 1
                           else jnp.concatenate(x_parts, axis=3))
        z_parts.append(y_parts[0] if len(y_parts) == 1
                       else jnp.concatenate(y_parts, axis=2))
    return (z_parts[0] if len(z_parts) == 1
            else jnp.concatenate(z_parts, axis=1))


def _conv_views(halo, ks, stride, out_sz, k0):
    """Static strided views of the halo, one per kernel offset.

    Offset (kz,ky,kx) contributes halo[s·o + k + k0] to out cell o —
    yields [K][T, oz, oy, ox, ...] without any gather.
    """
    kz_, ky_, kx_ = ks
    sz, sy, sx = stride
    oz, oy, ox = out_sz
    z0, y0, x0 = k0
    for i, (k_, s_, o_, z_) in enumerate(
            zip(ks, stride, out_sz, k0)):
        assert z_ >= 0 and z_ + k_ - 1 + s_ * (o_ - 1) < halo.shape[1 + i], \
            f'axis {i}: window [{z_}, {z_ + k_ - 1 + s_ * (o_ - 1)}] ' \
            f'exceeds halo dim {halo.shape[1 + i]}'
    views = []
    for kz in range(kz_):
        for ky in range(ky_):
            for kx in range(kx_):
                views.append(halo[
                    :,
                    z0 + kz: z0 + kz + sz * (oz - 1) + 1: sz,
                    y0 + ky: y0 + ky + sy * (oy - 1) + 1: sy,
                    x0 + kx: x0 + kx + sx * (ox - 1) + 1: sx])
    return views


def _apply_weight(views, weight, out_dtype):
    """views ⊛ weight → [T, oz, oy, ox, Cout] (f32 accumulate).

    Single im2col GEMM: concat the K offset views along channels and do
    one [.., K·Cin] × [K·Cin, Cout] dot. On TPU the minor dim is padded
    to 128 lanes, so K separate [.., Cin] dots waste up to 8× HBM traffic
    at Cin=16 (each view padded 16→128); the concatenated K·Cin minor dim
    is near-dense. At Cin≥128 the two forms are equivalent.
    """
    K = len(views)
    cin, cout = weight.shape[1], weight.shape[2]
    col = views[0] if K == 1 else jnp.concatenate(views, axis=-1)
    out = jax.lax.dot_general(
        col, weight.reshape(K * cin, cout).astype(col.dtype),
        dimension_numbers=(((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def subm_conv3d_tile(tt: TileTensor, weight, bias=None, kernel_size=3,
                     compute_dtype=None):
    """Submanifold conv on tiles (output sites == input sites).

    weight [K, Cin, Cout] in the z-major offset order of
    ops/sparse_conv.py._offsets — backends are weight-compatible.
    ``compute_dtype`` (e.g. bfloat16) casts the haloed features before the
    MXU GEMMs (f32 accumulation); output keeps the input feature dtype.
    """
    ks = _b3(kernel_size)
    h = tuple((k - 1) // 2 for k in ks)
    f = jnp.where(tt.mask[..., None], tt.features, 0)
    if compute_dtype is not None:
        f = f.astype(compute_dtype)
    halo = _build_halo(f, tt.nb_idx, h)
    views = _conv_views(halo, ks, (1, 1, 1), tt.tile_shape, (0, 0, 0))
    out = _apply_weight(views, weight, tt.features.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    out = jnp.where(tt.mask[..., None], out, 0)
    return TileTensor(out, tt.mask, tt.tile_coords, tt.nb_idx,
                      tt.spatial_shape, tt.batch_size)


def _shift_occ(occ, d):
    """occ [B, gz, gy, gx] → out[c] = occ[c - d] (zero beyond edges)."""
    out = occ
    for ax, di in enumerate(d):
        if di == 0:
            continue
        axis = 1 + ax
        nsz = out.shape[axis]
        pw = [(0, 0)] * out.ndim
        pw[axis] = (di, 0) if di > 0 else (0, -di)
        out = jnp.pad(out, pw)
        out = (lax.slice_in_dim(out, 0, nsz, axis=axis) if di > 0
               else lax.slice_in_dim(out, -di, nsz - di, axis=axis))
    return out


def _dilate_tiles(tt: TileTensor, dirs):
    """Add ``active_tile + d`` for each d in ``dirs`` (empty features) to
    the tile table — needed when a strided conv's active-set rule lets
    inputs activate output sites in a neighboring parent tile's region
    (exact spconv rule, or floor rule with pad != center). Capacity is the
    same table size; overflow drops (documented, like voxelize).

    Dense-grid version: the dilation is |dirs| boolean shifts of the
    occupancy grid, the feature move is one gather off the new slot map.
    """
    T = tt.tile_coords.shape[0]
    grid = tt.tiles_grid
    B = tt.batch_size
    valid = tt.valid
    lin, BIG = _tile_lin(tt.tile_coords, grid, B, valid)
    n = B * int(np.prod(grid))
    occ0 = jnp.zeros((n,), bool).at[lin].set(valid, mode='drop')
    occg = occ0.reshape((B,) + grid)
    occ = occg
    for d in np.asarray(dirs, np.int32).reshape(-1, 3):
        occ = occ | _shift_occ(occg, tuple(int(v) for v in d))
    tile_coords, smap = _table_from_occ(occ.reshape(-1), grid, B, T)
    dest = smap[lin]                       # T where dropped by capacity
    feats = jnp.zeros((T + 1,) + tt.features.shape[1:], tt.features.dtype)
    feats = feats.at[dest].set(tt.features, mode='drop')[:T]
    mask = jnp.zeros((T + 1,) + tt.mask.shape[1:], bool)
    mask = mask.at[dest].set(tt.mask, mode='drop')[:T]
    return TileTensor(feats, mask, tile_coords,
                      _neighbor_table(tile_coords, grid, B, smap),
                      tt.spatial_shape, tt.batch_size)


def sparse_conv3d_tile(tt: TileTensor, weight, bias=None, kernel_size=3,
                       stride=2, padding=1, out_tile_shape=None,
                       out_capacity: Optional[int] = None,
                       rule: str = 'floor', compute_dtype=None):
    """Strided sparse conv on tiles with re-tiling.

    rule='floor' matches ops/sparse_conv.py's active-set rule exactly;
    rule='spconv' implements the exact spconv receptive-field rule
    (any active input in the k-window activates the site).
    """
    ks = _b3(kernel_size)
    strd = _b3(stride)
    pad = _b3(padding)
    tz, ty, tx = tt.tile_shape
    nz, ny, nx = tt.spatial_shape
    out_shape = tuple((tt.spatial_shape[i] + 2 * pad[i] - ks[i])
                      // strd[i] + 1 for i in range(3))
    assert all(n > 0 for n in out_shape), \
        f'conv collapses spatial dim: {tt.spatial_shape} -> {out_shape}'
    for i in range(3):
        assert (tz, ty, tx)[i] % strd[i] == 0, \
            f'tile dim {i} not divisible by stride'
    rsz = tuple((tz, ty, tx)[i] // strd[i] for i in range(3))  # region
    ot = _b3(out_tile_shape) if out_tile_shape is not None \
        else (tz, ty, tx)
    m = tuple(ot[i] // rsz[i] for i in range(3))     # parents per out tile
    for i in range(3):
        assert ot[i] % rsz[i] == 0, 'out tile not a multiple of region'
    h = tuple(max(pad[i], ks[i] - pad[i] - strd[i], 0) for i in range(3))

    # mask-pooling window (in halo coords): start mk0, size mks, stride s
    if rule == 'floor':
        # site = floor((c + pad - center)/s) ⇒ c ∈ s·o + center - pad + [0,s)
        mk0 = tuple(((ks[i] - 1) // 2) - pad[i] + h[i] for i in range(3))
        mks = strd
    elif rule == 'spconv':
        mk0 = tuple(h[i] - pad[i] for i in range(3))
        mks = ks
    else:
        raise ValueError(rule)
    assert all(v >= 0 for v in mk0)
    # a tile ABSENT from the table still produces active out sites if the
    # pooling window of its region reaches into a present neighbor's cells:
    # window lower edge < tile start → sites fed by the LEFT neighbor
    # (dilate active tiles by +1); upper edge ≥ tile end → by the RIGHT
    # neighbor (dilate by -1)
    t3 = (tz, ty, tx)
    axis_dirs = []
    for i in range(3):
        d = [0]
        if mk0[i] - h[i] < 0:
            d.append(1)
        if mk0[i] + mks[i] - 1 + t3[i] - strd[i] - h[i] >= t3[i]:
            d.append(-1)
        axis_dirs.append(d)
    dil = [(a, b, c) for a in axis_dirs[0] for b in axis_dirs[1]
           for c in axis_dirs[2] if (a, b, c) != (0, 0, 0)]
    if dil:
        tt = _dilate_tiles(tt, dil)
    T = tt.tile_coords.shape[0]

    f = jnp.where(tt.mask[..., None], tt.features, 0)
    if compute_dtype is not None:
        f = f.astype(compute_dtype)
    halo = _build_halo(f, tt.nb_idx, h)
    # value offsets: out o ← halo[s·o + (h - pad) + k]
    k0 = tuple(h[i] - pad[i] for i in range(3))
    assert all(k0[i] >= 0 for i in range(3))
    views = _conv_views(halo, ks, strd, rsz, k0)
    region = _apply_weight(views, weight, tt.features.dtype)
    if bias is not None:
        region = region + bias.astype(region.dtype)

    # active-set pooling on the haloed mask
    mhalo = _build_halo(tt.mask, tt.nb_idx, h)
    mviews = _conv_views(mhalo, mks, strd, rsz, mk0)
    rmask = jnp.zeros(mviews[0].shape, bool)
    for v in mviews:
        rmask = rmask | v
    # clip to the global out grid
    tc = tt.tile_coords
    for i, n in enumerate(out_shape):
        base = tc[:, 1 + i] * rsz[i]                  # region global start
        loc = jax.lax.broadcasted_iota(jnp.int32, rmask.shape, 1 + i)
        rmask = rmask & ((base.reshape((T, 1, 1, 1)) + loc) < n)
    rmask = rmask & tt.valid.reshape((T, 1, 1, 1))
    region = jnp.where(rmask[..., None], region, 0)

    # ---- re-tile: s³ parent regions merge into out tiles of shape ot ----
    out_grid = tuple(-(-out_shape[i] // ot[i]) for i in range(3))
    mj = jnp.asarray(m, jnp.int32)
    parent = jnp.concatenate([tc[:, :1], tc[:, 1:] // mj], -1)
    octant = jnp.where(tt.valid[:, None], tc[:, 1:] % mj, 0)
    # an in-tile whose whole output region lies beyond the out grid (the
    # in grid over-covers out_shape after striding) contributes nothing
    # and must not linearize out of range
    ok = tt.valid & jnp.all(parent[:, 1:] < jnp.asarray(out_grid), -1)
    plin, BIG = _tile_lin(parent, out_grid, tt.batch_size, ok)
    cap = out_capacity or T
    ng = tt.batch_size * int(np.prod(out_grid))
    occ = jnp.zeros((ng,), bool).at[plin].set(ok, mode='drop')
    out_coords, smap = _table_from_occ(occ, out_grid, tt.batch_size, cap)
    dslot = smap[plin]                     # cap where dropped / invalid

    Cout = region.shape[-1]
    rz, ry, rx = rsz
    oz, oy, ox = ot
    feats = jnp.zeros((cap + 1, m[0], m[1], m[2], rz, ry, rx, Cout),
                      region.dtype)
    feats = feats.at[dslot, octant[:, 0], octant[:, 1],
                     octant[:, 2]].set(region, mode='drop')
    feats = feats[:cap].transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        cap, oz, oy, ox, Cout)
    omask = jnp.zeros((cap + 1, m[0], m[1], m[2], rz, ry, rx), bool)
    omask = omask.at[dslot, octant[:, 0], octant[:, 1],
                     octant[:, 2]].set(rmask, mode='drop')
    omask = omask[:cap].transpose(0, 1, 4, 2, 5, 3, 6).reshape(
        cap, oz, oy, ox)
    # drop out-tiles whose mask came out empty? Keep them (values are
    # zero there; they cost overcompute but keep slot layout stable).
    feats = jnp.where(omask[..., None], feats, 0)
    return TileTensor(
        feats, omask, out_coords,
        _neighbor_table(out_coords, out_grid, tt.batch_size, smap),
        out_shape, tt.batch_size)
