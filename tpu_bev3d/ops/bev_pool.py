"""LSS camera-to-BEV pooling (bev_pool) on TPU.

Replaces the reference's CUDA interval-reduction kernel
(ref: projects/BEVFusion/bevfusion/ops/bev_pool/src/bev_pool_cuda.cu:20-84,
python rank-sort interval construction bev_pool.py:43-143).

TPU design: the reference sorts frustum points by BEV-cell rank and sums each
contiguous interval. On TPU a direct scatter-add into the flattened BEV grid
is simpler, deterministic enough for inference (fp accumulation order differs
from the sorted-interval order but XLA's scatter-add is itself deterministic
run-to-run), fully differentiable, and avoids materializing sort indices:
``out = zeros[B*Z*H*W, C].at[rank].add(feats)``. Invalid points get an
out-of-bounds rank and are dropped by the scatter.

Why not a Pallas kernel (SURVEY §7 named this the "flagship Pallas
kernel"): a fused lift+pool kernel needs scatter-adds to ARBITRARY HBM
rows — Mosaic has no atomics and no efficient dynamic lane-dim
addressing, so the two viable shapes are (a) privatized per-core BEV
canvases + a reduction (the 360²×80 f32 canvas alone is 41 MB, >> 16 MB
VMEM, forcing an HBM round trip that IS the cost being avoided) or
(b) sort-by-rank + segmented sum (re-introducing the 400k-row sort the
scatter design eliminates). Measured end-to-end the XLA scatter path
already runs the view transform at ~5 ms device (top-24 lift, see
docs/benchmarks.md history) — the remaining win is bounded by HBM
bandwidth on the 65 MB frustum product, which XLA already fuses into the
scatter operand. Decision: keep the XLA formulation; revisit only if a
future Mosaic exposes HBM scatter-accumulate.

``bev_pool_ranks`` reproduces the reference's rank construction
(depth_lss.py:129-176): quantize geometry to the BEV grid, range-filter,
linearize (b, z, y, x).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bev_pool_ranks(geom, bev_start, bev_interval, bev_shape):
    """Compute flat BEV ranks for frustum points.

    Args:
      geom: [..., 3] frustum point coords in ego/lidar frame. Leading dims
        are (B, N_cam, D, H, W) in the view transform but any shape works —
        the batch index must be folded by the caller via ``batch_idx``.
      bev_start / bev_interval: static 3-tuples (x, y, z start and step).
      bev_shape: static (nx, ny, nz).
    Returns: (coords [..., 3] int32 (x,y,z), valid [...] bool).
    """
    start = jnp.asarray(bev_start, jnp.float32)
    interval = jnp.asarray(bev_interval, jnp.float32)
    shape = jnp.asarray(bev_shape, jnp.int32)
    # truncation toward zero, NOT floor: the reference casts with .long()
    # (depth_lss.py:137), so points in [start-interval, start) land in
    # cell 0 — parity-relevant at the BEV boundary
    c = ((geom - start) / interval).astype(jnp.int32)
    valid = jnp.all((c >= 0) & (c < shape), axis=-1)
    return c, valid


@partial(jax.jit, static_argnames=('bev_shape', 'accum_dtype'))
def bev_pool_from_ranks(feats, ranks, *, bev_shape: Tuple[int, int, int],
                        accum_dtype=None):
    """Pool with PRECOMPUTED flat ranks (the deploy fast path, ref
    depth_lss.py:249-252,455-476 geom_feats_precomputed): geometry is a
    pure function of the camera rig, so inference can skip the frustum
    math entirely. ranks [B, P] int32 in [0, nz·nx·ny] (== nz·nx·ny →
    dropped), produced by ``precompute_bev_ranks``.
    Returns [B, nz*C, nx, ny] like ``bev_pool``."""
    B = feats.shape[0]
    C = feats.shape[-1]
    nx, ny, nz = bev_shape
    acc = accum_dtype or feats.dtype
    f = feats.reshape(B, -1, C)

    def pool_one(fi, ri):
        out = jnp.zeros((nz * nx * ny, C), acc)
        return out.at[ri].add(fi.astype(acc), mode='drop')

    out = jax.vmap(pool_one)(f, ranks)
    out = out.reshape(B, nz, nx, ny, C)
    return jnp.transpose(out, (0, 1, 4, 2, 3)).reshape(B, nz * C, nx, ny)


def compute_flat_ranks(geom, bev_start, bev_interval, bev_shape):
    """geom [B, ..., 3] → flat ranks [B, P] for bev_pool_from_ranks."""
    nx, ny, nz = bev_shape
    coords, valid = bev_pool_ranks(geom, bev_start, bev_interval, bev_shape)
    B = geom.shape[0]
    cc = coords.reshape(B, -1, 3)
    vv = valid.reshape(B, -1)
    rank = (cc[..., 2] * (nx * ny) + cc[..., 0] * ny + cc[..., 1])
    return jnp.where(vv, rank, nz * nx * ny)


@partial(jax.jit, static_argnames=('bev_start', 'bev_interval', 'bev_shape',
                                   'accum_dtype'))
def bev_pool(feats, geom, *, bev_start: Tuple[float, float, float],
             bev_interval: Tuple[float, float, float],
             bev_shape: Tuple[int, int, int], accum_dtype=None):
    """Pool frustum features into a BEV grid.

    Args:
      feats: [B, ..., C] frustum features (e.g. [B, N, D, H, W, C]) — may be
        bf16; ``accum_dtype`` (default: feats dtype) sets the scatter
        accumulator so low-precision products still sum in f32.
      geom:  [B, ..., 3] matching coords in the ego frame.
      bev_shape: (nx, ny, nz).
    Returns: [B, nz*C, nx, ny] — XY-ORDER (rows = x bins), matching the
      reference's x-major ranks (depth_lss.py:166 ``rank = x*(W*D*B) +
      y*(D*B) + ...``) and its xy-order sparse lidar encoder; z collapsed
      into channels like ``cat(x.unbind(dim=2), 1)`` (depth_lss.py:202).
    """
    B = feats.shape[0]
    C = feats.shape[-1]
    nx, ny, nz = bev_shape
    acc = accum_dtype or feats.dtype
    coords, valid = bev_pool_ranks(geom, bev_start, bev_interval, bev_shape)
    f = feats.reshape(B, -1, C)
    cc = coords.reshape(B, -1, 3)
    vv = valid.reshape(B, -1)
    # rank within one sample: z*nx*ny + x*ny + y  (grid is [nz, nx, ny])
    rank = (cc[..., 2] * (nx * ny) + cc[..., 0] * ny + cc[..., 1])
    rank = jnp.where(vv, rank, nz * nx * ny)  # OOB → dropped

    def pool_one(fi, ri):
        out = jnp.zeros((nz * nx * ny, C), acc)
        return out.at[ri].add(fi.astype(acc), mode='drop')

    out = jax.vmap(pool_one)(f, rank)            # [B, nz*nx*ny, C]
    out = out.reshape(B, nz, nx, ny, C)
    # collapse z into channels: [B, nz*C, nx, ny]
    out = jnp.transpose(out, (0, 1, 4, 2, 3)).reshape(B, nz * C, nx, ny)
    return out
