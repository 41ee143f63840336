"""Dense canvas scatter ops (pillar → BEV image).

Replaces ref PointPillarsScatter (mmdet3d/models/middle_encoders/
pillar_scatter.py:11, forward_batch:64): place per-pillar feature vectors
onto a dense [B, C, H, W] canvas at their (y, x) coords.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('batch_size', 'ny', 'nx'))
def pillar_scatter(voxel_feats, coords, *, batch_size: int, ny: int, nx: int):
    """Scatter pillar features to a dense BEV canvas.

    Args:
      voxel_feats: [V, C] pillar features (padded; invalid rows ignored).
      coords: [V, 4] int32 (b, z, y, x), -1 for padding.
    Returns: [B, C, ny, nx].
    """
    V, C = voxel_feats.shape
    valid = coords[:, 0] >= 0
    flat = coords[:, 0] * (ny * nx) + coords[:, 2] * nx + coords[:, 3]
    flat = jnp.where(valid, flat, batch_size * ny * nx)  # OOB → drop
    canvas = jnp.zeros((batch_size * ny * nx, C), voxel_feats.dtype)
    canvas = canvas.at[flat].add(
        jnp.where(valid[:, None], voxel_feats, 0.0), mode='drop')
    return canvas.reshape(batch_size, ny, nx, C).transpose(0, 3, 1, 2)


@partial(jax.jit, static_argnames=('batch_size', 'nz', 'ny', 'nx'))
def voxel_scatter_dense(voxel_feats, coords, *, batch_size: int, nz: int,
                        ny: int, nx: int):
    """Scatter voxel features to a dense [B, C, nz, ny, nx] volume (the
    ``.dense()`` step at the end of sparse encoders, ref
    sparse_encoder.py:122-155)."""
    V, C = voxel_feats.shape
    valid = coords[:, 0] >= 0
    flat = (coords[:, 0] * (nz * ny * nx) + coords[:, 1] * (ny * nx)
            + coords[:, 2] * nx + coords[:, 3])
    flat = jnp.where(valid, flat, batch_size * nz * ny * nx)
    canvas = jnp.zeros((batch_size * nz * ny * nx, C), voxel_feats.dtype)
    canvas = canvas.at[flat].add(
        jnp.where(valid[:, None], voxel_feats, 0.0), mode='drop')
    return canvas.reshape(batch_size, nz, ny, nx, C).transpose(0, 4, 1, 2, 3)
