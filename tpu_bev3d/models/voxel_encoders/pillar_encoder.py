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


def decorate_pillars(voxels, num_points, coords, *, voxel_size,
                     point_cloud_range, with_cluster_center=True,
                     with_voxel_center=True, with_distance=False,
                     legacy=True):
    """Pillar point decoration (ref pillar_encoder.py:108-150).

    Returns ([V, T, C'], [V, T] mask). With legacy=True the raw xyz
    channels are REPLACED by the pillar-center offsets (the reference's
    in-place view mutation, pillar_encoder.py:133-142) — the layout every
    official torch checkpoint was trained with.
    """
    V, T, _ = voxels.shape
    mask = (jnp.arange(T)[None, :] < num_points[:, None])
    fmask = mask[..., None].astype(voxels.dtype)
    feats = [voxels]
    if with_cluster_center:
        pts_mean = (jnp.sum(voxels[..., :3] * fmask, 1, keepdims=True)
                    / jnp.maximum(num_points[:, None, None], 1)
                    .astype(voxels.dtype))
        feats.append(voxels[..., :3] - pts_mean)
    f_center = None
    if with_voxel_center:
        vx, vy, vz = voxel_size
        x0, y0, z0 = point_cloud_range[:3]
        cx = coords[:, 3:4].astype(voxels.dtype) * vx + (vx / 2 + x0)
        cy = coords[:, 2:3].astype(voxels.dtype) * vy + (vy / 2 + y0)
        cz = coords[:, 1:2].astype(voxels.dtype) * vz + (vz / 2 + z0)
        center = jnp.stack([cx, cy, cz], -1)            # [V,1,3]
        f_center = voxels[..., :3] - center
        if legacy:
            feats[0] = jnp.concatenate([f_center, voxels[..., 3:]], -1)
        feats.append(f_center)
    if with_distance:
        # ref computes the norm AFTER the legacy in-place mutation
        xyz = (f_center if (legacy and with_voxel_center)
               else voxels[..., :3])
        feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
    return jnp.concatenate(feats, -1) * fmask, mask


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
        x, mask = decorate_pillars(
            voxels, num_points, coords, voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            with_cluster_center=self.with_cluster_center,
            with_voxel_center=self.with_voxel_center,
            with_distance=self.with_distance, legacy=self.legacy)
        fmask = mask[..., None].astype(voxels.dtype)
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
