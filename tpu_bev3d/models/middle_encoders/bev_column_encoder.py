"""BEV column encoder — z-to-channels + 2D convs, the fastest TPU middle
encoder for BEVFusion-scale grids.

Motivation (measured on v5e, see tools/profile_blocks.py): the reference's
sparse 3D conv (spconv, ref mmdet3d sparse_encoder.py) maps to scalar-bound
gathers on TPU (~700 ms); a dense NDHWC Conv3D runs but XLA tiles 3-spatial
convolutions poorly (~117 ms device time at [41,1440,1440], ~2% MXU). This
encoder removes 3D convolution entirely: each BEV column's z-axis is packed
into the channel dimension during the scatter, and all compute is large
channels-last 2D convs — exactly what the MXU tiles best. FLOPs ≈ 0.4 TF
per frame, a few ms at bf16.

Functionally this plays SparseEncoder's role (points → [B, H/8, W/8, C]
BEV features, ref sparse_encoder.py:122-155 contract); architecturally it
is a deliberate TPU-first redesign (cited as such, not weight-compatible
with torch sparse-encoder checkpoints — use SparseEncoder + its mapping
table for checkpoint parity runs).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS


def scatter_columns(voxel_feats, coords, *, batch_size: int, nz: int,
                    ny: int, nx: int, pack_xy: int = 2):
    """Scatter [V, C] voxels into a column canvas
    [B, nx/p, ny/p, nz*p²*C] (z fastest-varying in channel groups).

    XY-ORDER: rows are x bins, matching the reference BEVFusion sparse
    encoder's xy layout (projects/BEVFusion/bevfusion/sparse_encoder.py)
    and our bev_pool camera BEV.

    coords [V, 4] int32 (b, z, y, x); padding rows have b = -1.
    """
    V, C = voxel_feats.shape
    p = pack_xy
    dx, dy = (nx + p - 1) // p, (ny + p - 1) // p
    nsub = nz * p * p
    valid = coords[:, 0] >= 0
    z, y, x = coords[:, 1], coords[:, 2], coords[:, 3]
    sub = z * (p * p) + (x % p) * p + (y % p)
    rows = coords[:, 0] * (dx * dy) + (x // p) * dy + (y // p)
    rows = jnp.where(valid, rows, batch_size * dx * dy)
    onehot = jax.nn.one_hot(sub, nsub, dtype=voxel_feats.dtype)
    wide = (onehot[:, :, None] * voxel_feats[:, None, :]).reshape(
        V, nsub * C)
    wide = jnp.where(valid[:, None], wide, 0)
    canvas = jnp.zeros((batch_size * dx * dy, nsub * C), voxel_feats.dtype)
    canvas = canvas.at[rows].add(wide, mode='drop')
    return canvas.reshape(batch_size, dx, dy, nsub * C)


def fused_stem_scatter(voxel_features, coords, weight, *, batch_size: int,
                       nz: int, ny: int, nx: int, pack_xy: int):
    """Scatter with the stem 1×1 conv FOLDED IN: each voxel's [C] features
    hit the weight slice of its intra-column position and the [ch0] result
    is scattered — mathematically identical to scatter_columns(pack_xy) +
    a 1×1 conv, but the [X/p·Y/p, nz·p²·C] canvas (850 MB at BEVFusion
    scale) never materializes. Measured ~3.5x faster than the widest-canvas
    path on v5e (the scatter, not the convs, is the encoder's cost).

    weight: [nsub, C, ch0] with nsub = nz·p².
    """
    V, C = voxel_features.shape
    p = pack_xy
    dx, dy = (nx + p - 1) // p, (ny + p - 1) // p
    valid = coords[:, 0] >= 0
    z, y, x = coords[:, 1], coords[:, 2], coords[:, 3]
    sub = z * (p * p) + (x % p) * p + (y % p)
    rows = coords[:, 0] * (dx * dy) + (x // p) * dy + (y // p)
    rows = jnp.where(valid, rows, batch_size * dx * dy)
    Wv = weight[sub]                                   # [V, C, ch0]
    contrib = jnp.einsum('vc,vck->vk', voxel_features, Wv)
    contrib = jnp.where(valid[:, None], contrib, 0)
    ch0 = weight.shape[-1]
    canvas = jnp.zeros((batch_size * dx * dy + 1, ch0),
                       voxel_features.dtype)
    canvas = canvas.at[rows].add(contrib, mode='drop')
    return canvas[:-1].reshape(batch_size, dx, dy, ch0)


def fused_point_stem_scatter(points, points_mask, weight, *,
                             voxel_size, pc_range, nz: int, ny: int,
                             nx: int, pack_xy: int):
    """Sort-free points → stem canvas: the whole hard-voxelize(mean) →
    stem-GEMV → scatter chain as TWO scatters and ONE gather.

    Per point p in voxel v: contribution (W_sub(v) @ x_p) / n_v, where
    n_v comes from a scatter-add count grid. Summed over the voxel this
    equals W_sub(v) @ mean_v — exactly fused_stem_scatter(hard_voxelize
    (reduce='mean')), with two deliberate deviations from the reference
    voxelizer (mmcv voxelization_cuda.cu): no max_points cap on the mean
    (the cap exists only to bound the torch voxel buffer; this path has
    no buffer) and no max_voxels cap (same reason). Removes the 30-250k
    argsort + segment scans — the lidar path's serial bottleneck.

    points [B,P,C]; weight [nz*p*p, C, ch0] → [B, nx/p, ny/p, ch0].
    Count grid is [B, nz*ny*nx] f32 (340 MB at BEVFusion scale, B=1) —
    transient, cheaper than the sort it replaces.
    """
    from ...ops.voxelize import compute_voxel_coords
    B, P, C = points.shape
    p = pack_xy
    dx, dy = (nx + p - 1) // p, (ny + p - 1) // p
    ch0 = weight.shape[-1]

    def one(pts, msk):
        cxyz, in_range, _ = compute_voxel_coords(
            pts, tuple(voxel_size), tuple(pc_range))
        x, y, z = cxyz[:, 0], cxyz[:, 1], cxyz[:, 2]
        valid = msk & in_range & (x < nx) & (y < ny) & (z < nz)
        lin = jnp.where(valid, z * (ny * nx) + y * nx + x, nz * ny * nx)
        counts = jnp.zeros((nz * ny * nx + 1,), jnp.float32)
        counts = counts.at[lin].add(1.0, mode='drop')
        n = jnp.maximum(counts[lin], 1.0)                  # [P]
        sub = z * (p * p) + (x % p) * p + (y % p)
        sub = jnp.where(valid, sub, 0)
        Wp = weight[sub]                                   # [P, C, ch0]
        contrib = jnp.einsum('pc,pck->pk', pts.astype(weight.dtype), Wp)
        contrib = jnp.where(valid[:, None],
                            contrib / n[:, None].astype(contrib.dtype), 0)
        rows = jnp.where(valid, (x // p) * dy + (y // p), dx * dy)
        canvas = jnp.zeros((dx * dy + 1, ch0), contrib.dtype)
        canvas = canvas.at[rows].add(contrib, mode='drop')
        return canvas[:-1].reshape(dx, dy, ch0)

    return jax.vmap(one)(points, points_mask)


def fused_point_stem_scatter_sorted(points, points_mask, weight, *,
                                    voxel_size, pc_range, max_points: int,
                                    nz: int, ny: int, nx: int,
                                    pack_xy: int):
    """Sorted per-point variant of the fused stem: keeps hard_voxelize's
    exact semantics (max_points cap, deterministic sorted order) but
    scatters PER-POINT stem contributions (W_sub @ x_p / n_v) straight to
    the canvas — P scatter rows instead of max_voxels, no voxel buffer,
    no per-voxel gather of W. Exactly equals
    fused_stem_scatter(hard_voxelize(reduce='mean')).
    """
    import jax.ops
    from ...ops.voxelize import compute_voxel_coords
    B, P, C = points.shape
    p = pack_xy
    dx, dy = (nx + p - 1) // p, (ny + p - 1) // p
    ch0 = weight.shape[-1]

    def one(pts, msk):
        cxyz, in_range, _ = compute_voxel_coords(
            pts, tuple(voxel_size), tuple(pc_range))
        x, y, z = cxyz[:, 0], cxyz[:, 1], cxyz[:, 2]
        # Explicit grid bound guard (matches fused_point_stem_scatter):
        # if sparse_shape is smaller than the voxel_size/pc_range-implied
        # grid, lin could exceed the sentinel and corrupt the canvas.
        valid = msk & in_range & (x < nx) & (y < ny) & (z < nz)
        lin = jnp.where(valid, z * (ny * nx) + y * nx + x, nz * ny * nx)
        order = jnp.argsort(lin, stable=True)
        lin_s = lin[order]
        valid_s = valid[order]
        pts_s = pts[order]
        cxyz_s = cxyz[order]
        iota = jnp.arange(P, dtype=jnp.int32)
        new_seg = valid_s & jnp.concatenate(
            [jnp.ones((1,), bool), lin_s[1:] != lin_s[:-1]])
        voxel_idx = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(new_seg, iota, -1))
        rank = iota - seg_start
        keep = valid_s & (rank < max_points)
        # capped per-voxel count → per-point denominator
        cnt = jax.ops.segment_sum(
            keep.astype(jnp.float32), jnp.where(keep, voxel_idx, P),
            num_segments=P + 1)[:P]
        n_p = jnp.maximum(cnt[jnp.clip(voxel_idx, 0, P - 1)], 1.0)
        xs, ys, zs = cxyz_s[:, 0], cxyz_s[:, 1], cxyz_s[:, 2]
        sub = jnp.where(keep, zs * (p * p) + (xs % p) * p + (ys % p), 0)
        rows = jnp.where(keep, (xs // p) * dy + (ys // p), dx * dy)
        Wp = weight[sub]                                   # [P, C, ch0]
        contrib = jnp.einsum('pc,pck->pk', pts_s.astype(weight.dtype),
                             Wp)
        contrib = jnp.where(keep[:, None],
                            contrib / n_p[:, None].astype(contrib.dtype),
                            0)
        canvas = jnp.zeros((dx * dy + 1, ch0), contrib.dtype)
        canvas = canvas.at[rows].add(contrib, mode='drop')
        return canvas[:-1].reshape(dx, dy, ch0)

    return jax.vmap(one)(points, points_mask)


@MODELS.register_module()
class BEVColumnEncoder(nn.Module):
    """Drop-in replacement for (BEVFusion)SparseEncoder / DenseVoxelEncoder.

    Output: [B, ny/total_stride, nx/total_stride, output_channels].
    Two modes:
    - fused_stem (default): pack_xy=4 column linear folded into the
      scatter (see fused_stem_scatter) + 2D conv stages — the fast path.
    - canvas mode: explicit packed canvas + conv stages.
    """
    in_channels: int = 5
    sparse_shape: Tuple[int, int, int] = (41, 1440, 1440)  # (D, H, W)
    stage_channels: Sequence[int] = (128, 128, 256, 256)
    stage_strides: Sequence[int] = (2, 1, 2, 1)
    output_channels: int = 256
    pack_xy: int = 2
    fused_stem: bool = False
    stem_channels: int = 128
    # voxel geometry for the fused points fast paths
    voxel_size: Any = None
    point_cloud_range: Any = None
    # 'sorted' (exact hard_voxelize semantics incl. max_points cap, P
    # scatter rows) or 'countgrid' (sort-free, no cap — wins only at very
    # high point counts; see fused_point_stem_scatter docstrings)
    point_path: str = 'sorted'
    max_points: int = 10

    def _stem_weight(self, dtype):
        nz, _, _ = self.sparse_shape
        nsub = nz * self.pack_xy * self.pack_xy
        return self.param(
            'stem_kernel', nn.initializers.lecun_normal(),
            (nsub, self.in_channels, self.stem_channels)).astype(dtype)

    @nn.compact
    def __call__(self, voxel_features=None, coors=None, batch_size: int = 1,
                 train: bool = False, points=None, points_mask=None):
        """Two entries: (voxel_features, coors, batch_size) — the standard
        voxelized path — or (points, points_mask) — the sort-free fast
        path fusing voxelize(mean) + stem into two scatters
        (fused_point_stem_scatter; needs fused_stem=True and
        voxel_size/point_cloud_range set)."""
        nz, ny, nx = self.sparse_shape
        if points is not None:
            w0 = self._stem_weight(points.dtype)
            if self.point_path == 'sorted':
                x = fused_point_stem_scatter_sorted(
                    points, points_mask, w0,
                    voxel_size=tuple(self.voxel_size),
                    pc_range=tuple(self.point_cloud_range),
                    max_points=self.max_points,
                    nz=nz, ny=ny, nx=nx, pack_xy=self.pack_xy)
            else:
                x = fused_point_stem_scatter(
                    points, points_mask, w0,
                    voxel_size=tuple(self.voxel_size),
                    pc_range=tuple(self.point_cloud_range),
                    nz=nz, ny=ny, nx=nx, pack_xy=self.pack_xy)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=x.dtype,
                             name='stem_bn')(x)
            x = nn.relu(x)
            return self._trunk(x, train)
        if self.fused_stem:
            w0 = self._stem_weight(voxel_features.dtype)
            x = fused_stem_scatter(voxel_features, coors, w0,
                                   batch_size=batch_size, nz=nz, ny=ny,
                                   nx=nx, pack_xy=self.pack_xy)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=x.dtype,
                             name='stem_bn')(x)
            x = nn.relu(x)
        else:
            x = scatter_columns(voxel_features, coors,
                                batch_size=batch_size, nz=nz, ny=ny,
                                nx=nx, pack_xy=self.pack_xy)
        return self._trunk(x, train)

    def _trunk(self, x, train):
        for i, (ch, st) in enumerate(zip(self.stage_channels,
                                         self.stage_strides)):
            x = nn.Conv(ch, (3, 3), strides=(st, st), padding='SAME',
                        use_bias=False, dtype=x.dtype, name=f'conv{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=x.dtype,
                             name=f'bn{i}')(x)
            x = nn.relu(x)
        if self.output_channels != x.shape[-1]:
            x = nn.Conv(self.output_channels, (1, 1), use_bias=False,
                        dtype=x.dtype, name='conv_out')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=x.dtype,
                             name='bn_out')(x)
            x = nn.relu(x)
        return x
