"""TPU-native voxelization: fixed-capacity sort + segment kernels.

Replaces the reference's CUDA voxelization stack:
- hard/dynamic voxelize (ref: projects/BEVFusion/bevfusion/ops/voxel/src/
  voxelization_cuda.cu:24-180, python wrapper ops/voxel/voxelize.py:10-152)
- mmcv ``_ext`` dynamic_voxelize/hard_voxelize used by
  mmdet3d/models/data_preprocessors/voxelize.py:11-14.

TPU design: no atomics, no dynamic shapes. Points arrive as a padded
``[P, C]`` buffer with a validity mask. We hash each point to a linear voxel
id, ``argsort`` (stable → first-come-first-served drop order within a voxel,
matching the reference's deterministic kernel semantics given its own
point-shuffle), find segment boundaries, and scatter into fixed-capacity
outputs with OOB-drop. Everything is O(P log P) sort + O(P) scans — XLA
compiles this to fused on-chip ops; determinism is by construction (the
reference needed a ``deterministic`` flag to avoid atomicAdd races,
voxelize.py:28-37 — we don't).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_voxel_coords(points, voxel_size, pc_range):
    """Per-point integer voxel coords (x_idx, y_idx, z_idx) + in-range mask.

    points: [..., C>=3]. Matches ref dynamic_voxelize_kernel semantics
    (voxelization_cuda.cu:24-61): floor((p - range_min)/voxel_size), reject
    out-of-grid.
    """
    voxel_size = jnp.asarray(voxel_size, jnp.float32)
    rmin = jnp.asarray(pc_range[:3], jnp.float32)
    rmax = jnp.asarray(pc_range[3:], jnp.float32)
    grid = jnp.round((rmax - rmin) / voxel_size).astype(jnp.int32)
    c = jnp.floor((points[..., :3] - rmin) / voxel_size).astype(jnp.int32)
    in_range = jnp.all((c >= 0) & (c < grid), axis=-1)
    return c, in_range, grid


def grid_shape_of(voxel_size, pc_range) -> Tuple[int, int, int]:
    """Static (Gx, Gy, Gz) grid shape."""
    vs = np.asarray(voxel_size, np.float64)
    rng = np.asarray(pc_range, np.float64)
    g = np.round((rng[3:] - rng[:3]) / vs).astype(np.int64)
    return int(g[0]), int(g[1]), int(g[2])


@partial(jax.jit, static_argnames=('max_points', 'max_voxels', 'voxel_size',
                                   'pc_range', 'reduce'))
def hard_voxelize(points, points_mask, *, voxel_size, pc_range,
                  max_points: int, max_voxels: int, reduce: str | None = None):
    """Hard voxelization with fixed capacity.

    Args:
      points: [P, C] float32 padded point buffer.
      points_mask: [P] bool validity.
      voxel_size / pc_range: static tuples.
      max_points: capacity per voxel (ref `max_points`, voxelize.py:17).
      max_voxels: total voxel capacity.
      reduce: None → return raw [V, max_points, C] voxels;
        'mean' → additionally mean-reduce to [V, C] (the HardSimpleVFE /
        BEVFusion ``voxelize_reduce`` path, bevfusion.py:251-253, fused here
        to avoid materializing the [V, max_points, C] tensor in HBM).

    Returns dict with:
      voxels:    [max_voxels, max_points, C] (or [max_voxels, C] if reduce)
      coords:    [max_voxels, 3] int32 (z, y, x), -1 padded (ref coor order,
                 voxelization_cuda.cu stores (z,y,x) — hard_voxelize returns
                 coors reversed, see voxelize.py:73-76)
      num_points:[max_voxels] int32
      num_voxels:[] int32
    """
    P, C = points.shape
    coords_xyz, in_range, grid = compute_voxel_coords(points, voxel_size, pc_range)
    gx, gy, gz = grid_shape_of(voxel_size, pc_range)
    valid = points_mask & in_range
    lin = (coords_xyz[:, 2] * (gy * gx) + coords_xyz[:, 1] * gx + coords_xyz[:, 0])
    BIG = jnp.int32(gx * gy * gz)
    lin = jnp.where(valid, lin, BIG)

    order = jnp.argsort(lin, stable=True)
    lin_s = lin[order]
    valid_s = valid[order]
    pts_s = points[order]
    coords_s = coords_xyz[order]

    iota = jnp.arange(P, dtype=jnp.int32)
    new_seg = valid_s & jnp.concatenate(
        [jnp.ones((1,), bool), lin_s[1:] != lin_s[:-1]])
    voxel_idx = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # [P]
    # rank within voxel = i - segment_start(i), via running max of start idx
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_seg, iota, -1))
    rank = iota - seg_start

    # Survivor selection under voxel-capacity overflow: the reference CUDA
    # kernel allocates voxels in point-ARRIVAL order (the first point that
    # touches a new voxel claims the next slot; once full, new voxels are
    # rejected — voxelization_cuda.cu:105-180, randomized upstream by
    # PointShuffle). Keeping the smallest-linear-id voxels instead would
    # systematically drop high-z/high-y regions on overflowing real clouds
    # (~250-300k-point nuScenes sweeps vs max_voxels=120k).
    # Sort-free rank: a segment's head is its earliest-original-index
    # point (stable sort); scatter head flags back to original order,
    # cumsum = the CUDA kernel's allocation counter, gather each row's
    # head allocation number. O(P) scatter+scan+gather — no extra sorts
    # (an argsort-based rank here cost ~5 ms/frame at 30k points).
    is_head = jnp.zeros((P,), bool).at[order].set(new_seg)
    alloc = jnp.cumsum(is_head.astype(jnp.int32))          # original order
    head_orig = order[seg_start]                           # [P] per row
    survive_s = valid_s & (alloc[head_orig] <= max_voxels)
    new_seg = new_seg & survive_s
    voxel_idx = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # compact slots
    keep = survive_s & (rank < max_points)
    vi = jnp.where(keep, voxel_idx, max_voxels)  # OOB → dropped
    ri = jnp.where(keep, rank, 0)

    if reduce == 'mean':
        flat = vi  # segment id per point
        feat_sum = jax.ops.segment_sum(
            jnp.where(keep[:, None], pts_s, 0.0), flat,
            num_segments=max_voxels + 1)[:max_voxels]
        cnt = jax.ops.segment_sum(keep.astype(jnp.float32), flat,
                                  num_segments=max_voxels + 1)[:max_voxels]
        voxels = feat_sum / jnp.maximum(cnt[:, None], 1.0)
        num_points = cnt.astype(jnp.int32)
    else:
        voxels = jnp.zeros((max_voxels, max_points, C), points.dtype)
        voxels = voxels.at[vi, ri].set(pts_s, mode='drop')
        num_points = jax.ops.segment_sum(
            keep.astype(jnp.int32), vi, num_segments=max_voxels + 1)[:max_voxels]

    # coords in (z, y, x) order like the reference
    czyx = coords_s[:, ::-1]
    coords = jnp.full((max_voxels, 3), -1, jnp.int32)
    first = new_seg & (voxel_idx < max_voxels)
    ci = jnp.where(first, voxel_idx, max_voxels)
    coords = coords.at[ci].set(czyx, mode='drop')
    num_voxels = jnp.minimum(jnp.sum(new_seg.astype(jnp.int32)),
                             jnp.int32(max_voxels))
    return dict(voxels=voxels, coords=coords, num_points=num_points,
                num_voxels=num_voxels)


@partial(jax.jit, static_argnames=('voxel_size', 'pc_range'))
def dynamic_voxelize(points, points_mask, *, voxel_size, pc_range):
    """Per-point voxel coords (z, y, x), -1 for out-of-range/invalid.
    Ref: dynamic_voxelize_kernel (voxelization_cuda.cu:24-61) /
    mmcv dynamic_voxelize_forward."""
    coords_xyz, in_range, _ = compute_voxel_coords(points, voxel_size, pc_range)
    valid = points_mask & in_range
    czyx = coords_xyz[:, ::-1]
    return jnp.where(valid[:, None], czyx, -1)


@partial(jax.jit, static_argnames=('max_voxels', 'reduce', 'grid_shape'))
def dynamic_scatter(feats, coords, *, grid_shape, max_voxels: int,
                    reduce: str = 'mean'):
    """Scatter per-point features into unique voxels (DynamicScatter).

    Replaces ref scatter_points_cuda.cu (feats_reduce_kernel:81, CAS
    reduceMax/reduceAdd:22-75) with sort + segment reductions — autodiff
    works for free, no backward traceback kernels needed.

    Args:
      feats:  [P, C] float; coords: [P, 3] int32 (z, y, x), -1 = invalid.
      grid_shape: static (Gx, Gy, Gz).
      reduce: 'mean' | 'max' | 'sum'.
    Returns:
      voxel_feats [max_voxels, C], voxel_coords [max_voxels, 3] (-1 pad),
      point2voxel [P] int32 (index into output voxels, -1 invalid),
      num_voxels [].
    """
    P, C = feats.shape
    gx, gy, gz = grid_shape
    valid = coords[:, 0] >= 0
    if gx * gy * gz < 2**31 - 1:
        lin = coords[:, 0] * (gy * gx) + coords[:, 1] * gx + coords[:, 2]
        lin = jnp.where(valid, lin, jnp.int32(gx * gy * gz))
        order = jnp.argsort(lin, stable=True)
        lin_s = lin[order]
        adj_diff = lin_s[1:] != lin_s[:-1]
    else:
        # grids past 2^31 cells (e.g. the faithful MinkUNet SemanticKITTI
        # grid 4000x4000x800, ref configs/_base_/models/minkunet.py:11-12)
        # cannot linearize in int32 — lexicographic two-key sort instead:
        # ka = z*gy + y (fits int32), kb = x
        assert gz * gy < 2**31 - 1, 'z*y plane too large for int32'
        ka = jnp.where(valid, coords[:, 0] * gy + coords[:, 1],
                       jnp.int32(gz * gy))
        kb = jnp.where(valid, coords[:, 2], jnp.int32(gx))
        ka_s, kb_s, order = jax.lax.sort(
            (ka, kb, jnp.arange(P, dtype=jnp.int32)), num_keys=2)
        adj_diff = (ka_s[1:] != ka_s[:-1]) | (kb_s[1:] != kb_s[:-1])
    valid_s = valid[order]
    feats_s = feats[order]
    coords_s = coords[order]

    new_seg = valid_s & jnp.concatenate(
        [jnp.ones((1,), bool), adj_diff])
    voxel_idx = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s & (voxel_idx < max_voxels), voxel_idx, max_voxels)

    if reduce == 'max':
        init = jnp.full((max_voxels + 1, C), -jnp.inf, feats.dtype)
        vf = init.at[seg].max(jnp.where(valid_s[:, None], feats_s, -jnp.inf))
        vf = jnp.where(jnp.isfinite(vf), vf, 0.0)[:max_voxels]
    else:
        s = jax.ops.segment_sum(jnp.where(valid_s[:, None], feats_s, 0.0),
                                seg, num_segments=max_voxels + 1)
        if reduce == 'mean':
            cnt = jax.ops.segment_sum(valid_s.astype(feats.dtype), seg,
                                      num_segments=max_voxels + 1)
            s = s / jnp.maximum(cnt[:, None], 1.0)
        vf = s[:max_voxels]

    vcoords = jnp.full((max_voxels, 3), -1, jnp.int32)
    ci = jnp.where(new_seg & (voxel_idx < max_voxels), voxel_idx, max_voxels)
    vcoords = vcoords.at[ci].set(coords_s, mode='drop')
    p2v_s = jnp.where(valid_s & (voxel_idx < max_voxels), voxel_idx, -1)
    point2voxel = jnp.zeros((P,), jnp.int32).at[order].set(p2v_s)
    num_voxels = jnp.minimum(jnp.sum(new_seg.astype(jnp.int32)),
                             jnp.int32(max_voxels))
    return vf, vcoords, point2voxel, num_voxels


def cylindrical_coords(points, points_mask, *, grid_shape, pc_range_cyl):
    """Per-point cylindrical voxel coords (ref Det3DDataPreprocessor
    'cylindrical' voxelize mode, data_preprocessor.py:397-428).

    pc_range_cyl: (rho_min, phi_min, z_min, rho_max, phi_max, z_max) with
    phi in radians (typically ±π). grid_shape: (n_rho, n_phi, n_z).
    Returns [..., 3] int32 (z, phi, rho)-ordered coords, -1 invalid (same
    (z, y, x)-style ordering as the cartesian path).
    """
    rho = jnp.linalg.norm(points[..., :2], axis=-1)
    phi = jnp.arctan2(points[..., 1], points[..., 0])
    z = points[..., 2]
    cyl = jnp.stack([rho, phi, z], -1)
    lo = jnp.asarray(pc_range_cyl[:3], jnp.float32)
    hi = jnp.asarray(pc_range_cyl[3:], jnp.float32)
    g = jnp.asarray(grid_shape, jnp.int32)
    size = (hi - lo) / jnp.asarray(grid_shape, jnp.float32)
    c = jnp.floor((cyl - lo) / size).astype(jnp.int32)
    valid = points_mask & jnp.all((c >= 0) & (c < g), axis=-1)
    czyx = c[..., ::-1]
    return jnp.where(valid[..., None], czyx, -1)


def batch_hard_voxelize(points, points_mask, *, voxel_size, pc_range,
                        max_points: int, max_voxels_per_sample: int,
                        reduce: str | None = None):
    """Batched hard voxelization: vmap over samples, then concatenate with a
    batch column prepended to coords → [(B*V), 4] (b, z, y, x), matching the
    reference's per-sample voxelize + F.pad batch-id loop
    (bevfusion.py:228-249) without the host loop."""
    B = points.shape[0]
    out = jax.vmap(lambda p, m: hard_voxelize(
        p, m, voxel_size=voxel_size, pc_range=pc_range,
        max_points=max_points, max_voxels=max_voxels_per_sample,
        reduce=reduce))(points, points_mask)
    V = max_voxels_per_sample
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), V).reshape(B, V, 1)
    coords = jnp.concatenate([
        jnp.where(out['coords'][..., :1] >= 0, bidx, -1), out['coords']], -1)
    feat_shape = (B * V,) + out['voxels'].shape[2:]
    return dict(
        voxels=out['voxels'].reshape(feat_shape),
        coords=coords.reshape(B * V, 4),
        num_points=out['num_points'].reshape(B * V),
        num_voxels=out['num_voxels'],
    )
