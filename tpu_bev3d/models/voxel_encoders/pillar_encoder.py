"""Pillar feature encoder (PointPillars).

Ref: mmdet3d/models/voxel_encoders/pillar_encoder.py — PillarFeatureNet:14
decorates raw points with cluster-center offsets + pillar-center offsets,
runs PFN layers (Linear+BN+ReLU) and max-pools over points per pillar.
TPU notes: [V, T, Cin] is a dense tensor; the Linear lands on the MXU as one
[V*T, Cin]x[Cin, Cout] GEMM. BN is masked so padding points don't poison
batch statistics (the reference flattens valid points, utils.py:15-95).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import MaskedBatchNorm


@MODELS.register_module()
class PillarFeatureNet(nn.Module):
    """Ref pillar_encoder.py:14-163.

    Args mirror the reference config surface:
      in_channels: raw point feature count (4 for KITTI xyzi).
      feat_channels: PFN layer widths, e.g. (64,).
      with_distance: append ||xyz|| channel.
      with_cluster_center / with_voxel_center: decoration flags.
      voxel_size / point_cloud_range: for pillar-center computation.
    """
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 4.0)
    point_cloud_range: Tuple[float, ...] = (0., -40., -3., 70.4, 40., 1.)
    legacy: bool = True

    @nn.compact
    def __call__(self, voxels, num_points, coords, train: bool = False):
        """voxels [V, T, C]; num_points [V]; coords [V, 4] (b,z,y,x) → [V, F].
        """
        V, T, _ = voxels.shape
        mask = (jnp.arange(T)[None, :] < num_points[:, None])  # [V, T]
        fmask = mask[..., None].astype(voxels.dtype)
        feats = [voxels]
        if self.with_cluster_center:
            pts_mean = (jnp.sum(voxels[..., :3] * fmask, 1, keepdims=True)
                        / jnp.maximum(num_points[:, None, None], 1)
                        .astype(voxels.dtype))
            feats.append(voxels[..., :3] - pts_mean)
        if self.with_voxel_center:
            vx, vy, vz = self.voxel_size
            x0, y0, z0 = self.point_cloud_range[:3]
            cx = coords[:, 3:4].astype(voxels.dtype) * vx + (vx / 2 + x0)
            cy = coords[:, 2:3].astype(voxels.dtype) * vy + (vy / 2 + y0)
            cz = coords[:, 1:2].astype(voxels.dtype) * vz + (vz / 2 + z0)
            center = jnp.stack([cx, cy, cz], -1)            # [V,1,3]
            feats.append(voxels[..., :3] - center)
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, -1) * fmask
        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False, dtype=x.dtype)(x)
            x = MaskedBatchNorm()(x, mask, train=train)
            x = nn.relu(x)
            x = x * fmask
            if i < len(self.feat_channels) - 1:
                # PFN intermediate layers concat the per-pillar max back onto
                # every point (ref utils.py PFNLayer)
                mx = jnp.max(jnp.where(fmask > 0, x, -jnp.inf), 1,
                             keepdims=True)
                mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(mx, x.shape)], -1) * fmask
        out = jnp.max(jnp.where(fmask > 0, x, -jnp.inf), axis=1)
        return jnp.where(jnp.isfinite(out), out, 0.0)
