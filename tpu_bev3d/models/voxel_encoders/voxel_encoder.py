"""Simple voxel feature encoders.

Refs: mmdet3d/models/voxel_encoders/voxel_encoder.py — HardSimpleVFE:14
(mean of points per voxel), DynamicSimpleVFE:48 (scatter-mean).
Stateless → plain functions wrapped in tiny classes for registry/config
parity; they run inside the detector's jitted forward.
"""
from __future__ import annotations

from typing import Sequence, Tuple

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


@MODELS.register_module()
class DynamicVFE(nn.Module):
    """Dynamic voxel feature encoder (ref voxel_encoder.py:86-287).

    Per-POINT MLP layers with voxel-level aggregation: points are decorated
    with cluster-center and voxel-center offsets, passed through
    Linear+BN+ReLU layers; between layers the per-voxel max is gathered back
    and concatenated to each point; the final voxel feature is the max over
    the voxel's points. Consumes the padded per-point table + per-point
    voxel ids (from dynamic voxelization) — all fixed-shape segment ops.
    """
    in_channels: int = 4
    feat_channels: Sequence[int] = (64, 64)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 4.0)
    point_cloud_range: Tuple[float, ...] = (0., -40., -3., 70.4, 40., 1.)

    @nn.compact
    def __call__(self, points, point_voxel_ids, num_voxels: int,
                 coords=None, train: bool = False):
        """points [P, C]; point_voxel_ids [P] int32 (-1 invalid, index into
        the voxel table); num_voxels: static voxel capacity. → [V, F]."""
        import jax
        from ..layers.common import MaskedBatchNorm
        P = points.shape[0]
        valid = point_voxel_ids >= 0
        seg = jnp.where(valid, point_voxel_ids, num_voxels)
        feats = [points]
        if self.with_cluster_center:
            s = jax.ops.segment_sum(
                jnp.where(valid[:, None], points[:, :3], 0.0), seg,
                num_segments=num_voxels + 1)
            c = jax.ops.segment_sum(valid.astype(points.dtype), seg,
                                    num_segments=num_voxels + 1)
            mean = s / jnp.maximum(c[:, None], 1.0)
            feats.append(points[:, :3] - mean[seg])
        if self.with_voxel_center and coords is not None:
            vx, vy, vz = self.voxel_size
            x0, y0, z0 = self.point_cloud_range[:3]
            pc = coords[seg.clip(0, coords.shape[0] - 1)]
            cx = pc[:, 3:4].astype(points.dtype) * vx + (vx / 2 + x0)
            cy = pc[:, 2:3].astype(points.dtype) * vy + (vy / 2 + y0)
            cz = pc[:, 1:2].astype(points.dtype) * vz + (vz / 2 + z0)
            feats.append(points[:, :3]
                         - jnp.concatenate([cx, cy, cz], -1))
        if self.with_distance:
            feats.append(jnp.linalg.norm(points[:, :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, -1)
        x = jnp.where(valid[:, None], x, 0.0)
        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False, dtype=x.dtype)(x)
            x = MaskedBatchNorm()(x, valid, train=train)
            x = nn.relu(x) * valid[:, None].astype(x.dtype)
            vmax = jax.ops.segment_max(
                jnp.where(valid[:, None], x, -jnp.inf), seg,
                num_segments=num_voxels + 1)
            vmax = jnp.where(jnp.isfinite(vmax), vmax, 0.0)
            if i < len(self.feat_channels) - 1:
                x = jnp.concatenate([x, vmax[seg]], -1) \
                    * valid[:, None].astype(x.dtype)
        return vmax[:num_voxels]
