"""Voxel Set Abstraction for PV-RCNN.

Ref: mmdet3d/models/middle_encoders/voxel_set_abstraction.py:1-335 —
FPS keypoints from raw points; per keypoint, aggregate (a) raw-point SA,
(b) SA over each sparse-encoder stage's active voxel centers, (c)
bilinear BEV features; concat into keypoint features.

TPU design: fixed K keypoints; every source is a ball-query + shared-MLP
max over fixed neighbor slots; voxel centers come from the fixed-capacity
sparse coordinate tables (invalid slots masked).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.pointnet_ops import (ball_query, furthest_point_sample,
                                 grouping_operation)
from ...registry import MODELS
from ..layers.pointnet_modules import SharedMLP
from ..roi_heads.bev_roi_head import bilinear_sample_bev


class _TargetSAMSG(nn.Module):
    """MSG ball-query SA around GIVEN target centers."""
    radii: Sequence[float]
    num_samples: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, target_xyz, xyz, feats, mask, train: bool = False):
        outs = []
        for bi, (r, k, mlp) in enumerate(zip(self.radii, self.num_samples,
                                             self.mlp_channels)):
            k = min(k, xyz.shape[0])
            nidx, nvalid = ball_query(target_xyz, xyz, mask, r, k)
            g_xyz = grouping_operation(xyz, nidx) - target_xyz[:, None]
            g = g_xyz if feats is None else jnp.concatenate(
                [g_xyz, grouping_operation(feats, nidx)], -1)
            g = SharedMLP(tuple(mlp), name=f'mlp{bi}')(g, nvalid, train)
            g = jnp.where(nvalid[..., None], g, -jnp.inf)
            o = jnp.max(g, axis=1)
            outs.append(jnp.where(jnp.isfinite(o), o, 0.0))
        return jnp.concatenate(outs, -1)


@MODELS.register_module()
class VoxelSetAbstraction(nn.Module):
    """Config surface mirrors the reference's (voxel_set_abstraction.py)."""
    num_keypoints: int = 2048
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    voxel_size: Sequence[float] = (0.05, 0.05, 0.1)
    # raw-point source
    rawpoints_radii: Sequence[float] = (0.4, 0.8)
    rawpoints_samples: Sequence[int] = (16, 16)
    rawpoints_mlps: Sequence[Sequence[int]] = ((16, 16), (16, 16))
    # per-stage voxel sources: (stage_idx, downsample_factor, radii,
    # samples, mlps)
    voxel_sa_cfgs: Any = (
        dict(stage=0, factor=1, radii=(0.4, 0.8), samples=(16, 16),
             mlps=((16, 16), (16, 16))),
        dict(stage=2, factor=4, radii=(1.6, 3.2), samples=(16, 16),
             mlps=((32, 32), (32, 32))),
    )
    use_bev: bool = True
    bev_scale_factor: int = 8

    @nn.compact
    def __call__(self, points, points_mask, middle_feats, bev_feats,
                 train: bool = False):
        """points [B,P,3+]; middle_feats: list of SparseTensor (batched
        tables); bev_feats [B,H,W,C] → (kp_xyz [B,K,3], kp_feats [B,K,C'],
        kp_mask [B,K])."""
        B = points.shape[0]
        pcr = self.point_cloud_range
        vsz = self.voxel_size

        def keypoints_one(pts, pm):
            idx = furthest_point_sample(pts[:, :3], pm, self.num_keypoints)
            return pts[idx, :3], pm[idx]

        kp_xyz, kp_mask = jax.vmap(keypoints_one)(points, points_mask)

        def batched_sa(radii, samples, mlps, name, in_axes):
            return nn.vmap(
                _TargetSAMSG, in_axes=in_axes, out_axes=0,
                variable_axes={'params': None, 'batch_stats': None},
                split_rngs={'params': False},
                methods=['__call__'])(radii, samples, mlps, name=name)

        feats_list = []
        # (a) raw points (feats may be width-0 when points are bare xyz)
        raw_sa = batched_sa(tuple(self.rawpoints_radii),
                            tuple(self.rawpoints_samples),
                            tuple(tuple(m) for m in self.rawpoints_mlps),
                            'rawpoints_sa', (0, 0, 0, 0, None))
        feats_list.append(raw_sa(kp_xyz, points[..., :3], points[..., 3:],
                                 points_mask, False))
        # (b) sparse stages: voxel centers in world coords
        for ci, cfg in enumerate(tuple(self.voxel_sa_cfgs)):
            st = middle_feats[cfg['stage']]
            f = cfg['factor']
            coords = st.coords
            centers = jnp.stack([
                coords[:, 3].astype(jnp.float32) * vsz[0] * f
                + vsz[0] * f / 2 + pcr[0],
                coords[:, 2].astype(jnp.float32) * vsz[1] * f
                + vsz[1] * f / 2 + pcr[1],
                coords[:, 1].astype(jnp.float32) * vsz[2] * f
                + vsz[2] * f / 2 + pcr[2]], -1)
            vmask_b = st.valid[None] & (coords[None, :, 0]
                                        == jnp.arange(B)[:, None])
            sa = batched_sa(tuple(cfg['radii']), tuple(cfg['samples']),
                            tuple(tuple(m) for m in cfg['mlps']),
                            f'voxel_sa_{ci}', (0, None, None, 0, None))
            feats_list.append(sa(kp_xyz, centers, st.features, vmask_b,
                                 False))
        # (c) BEV bilinear
        if self.use_bev and bev_feats is not None:
            feats_list.append(jax.vmap(
                lambda f, kp: bilinear_sample_bev(
                    f, kp[:, :2], pcr, None))(bev_feats, kp_xyz))
        kp_feats = jnp.concatenate(feats_list, -1)
        kp_feats = kp_feats * kp_mask[..., None]
        return kp_xyz, kp_feats, kp_mask
