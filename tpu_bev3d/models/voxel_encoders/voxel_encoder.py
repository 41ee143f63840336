"""Simple voxel feature encoders.

Refs: mmdet3d/models/voxel_encoders/voxel_encoder.py — HardSimpleVFE:14
(mean of points per voxel), DynamicSimpleVFE:48 (scatter-mean).
Stateless → plain functions wrapped in tiny classes for registry/config
parity; they run inside the detector's jitted forward.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS


@MODELS.register_module()
class HardSimpleVFE(nn.Module):
    """Mean of valid points per voxel (ref voxel_encoder.py:14-45)."""
    num_features: int = 4

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, train=False):
        """voxels [V, T, C]; num_points [V] → [V, C]."""
        T = voxels.shape[1]
        mask = (jnp.arange(T)[None, :] < num_points[:, None])
        s = jnp.sum(voxels * mask[..., None].astype(voxels.dtype), axis=1)
        return s / jnp.maximum(num_points[:, None], 1).astype(voxels.dtype)


@MODELS.register_module()
class DynamicSimpleVFE(nn.Module):
    """Identity passthrough: the mean-reduce already happened in
    ``dynamic_scatter`` (ref voxel_encoder.py:48-83 semantics; on TPU the
    scatter-mean is fused into voxelization, ops/voxelize.py)."""
    num_features: int = 4

    @nn.compact
    def __call__(self, voxel_feats, *a, train=False, **k):
        return voxel_feats
