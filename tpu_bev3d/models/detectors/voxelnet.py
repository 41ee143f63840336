"""Single-stage voxel detectors (PointPillars / SECOND).

Ref: mmdet3d/models/detectors/voxelnet.py:12 (voxel_encoder →
middle_encoder → backbone → neck → bbox_head) with the reference's 3-mode
forward dispatch (base.py:32-92 — 'tensor' | 'loss' | 'predict').

TPU design: the whole forward — including voxelization, which the reference
does in the data preprocessor on GPU (data_preprocessor.py:342-467) — is one
jittable function over a fixed-shape batch:
  batch = dict(points [B, P, C], points_mask [B, P],
               gt_bboxes_3d [B, G, 7+], gt_labels_3d [B, G], gt_mask [B, G])
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import batch_hard_voxelize
from ...registry import MODELS


@MODELS.register_module()
class VoxelNet(nn.Module):
    voxel_encoder: Any = None
    middle_encoder: Any = None
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    # voxelization (ref data_preprocessor voxel_layer cfg)
    voxel_size: Any = (0.16, 0.16, 4)
    point_cloud_range: Any = (0, -39.68, -3, 69.12, 39.68, 1)
    max_num_points: int = 32
    max_voxels: int = 16000

    def setup(self):
        self._voxel_encoder = MODELS.build(dict(self.voxel_encoder))
        self._middle_encoder = MODELS.build(dict(self.middle_encoder))
        self._backbone = MODELS.build(dict(self.backbone))
        self._neck = MODELS.build(dict(self.neck)) if self.neck else None
        self._bbox_head = MODELS.build(dict(self.bbox_head))

    def extract_feat(self, points, points_mask, train: bool = False):
        B = points.shape[0]
        vox = batch_hard_voxelize(
            points, points_mask,
            voxel_size=tuple(self.voxel_size),
            pc_range=tuple(self.point_cloud_range),
            max_points=self.max_num_points,
            max_voxels_per_sample=self.max_voxels)
        vf = self._voxel_encoder(vox['voxels'], vox['num_points'],
                                 vox['coords'], train=train)
        x = self._middle_encoder(vf, vox['coords'], B, train=train)
        x = self._backbone(x, train=train)
        if self._neck is not None:
            x = self._neck(x, train=train)
        return x

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        feats = self.extract_feat(batch['points'], batch['points_mask'],
                                  train=train)
        outs = self._bbox_head(feats, train=train)
        if mode == 'tensor':
            return outs
        if mode == 'loss':
            return self._bbox_head.loss_by_feat(
                outs, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(outs)
        raise ValueError(mode)


@MODELS.register_module()
class DynamicVoxelNet(VoxelNet):
    """Dynamic-voxelization variant (ref mmdet3d/models/detectors/
    dynamic_voxelnet.py): per-point voxel ids + DynamicVFE, no per-voxel
    point capacity."""

    def extract_feat(self, points, points_mask, train: bool = False):
        import jax
        from ...ops.voxelize import dynamic_voxelize, dynamic_scatter, \
            grid_shape_of
        B, P, C = points.shape
        gx, gy, gz = grid_shape_of(tuple(self.voxel_size),
                                   tuple(self.point_cloud_range))
        V = self.max_voxels

        def one(p, m):
            coords = dynamic_voxelize(
                p, m, voxel_size=tuple(self.voxel_size),
                pc_range=tuple(self.point_cloud_range))
            vf, vcoords, p2v, nv = dynamic_scatter(
                p, coords, grid_shape=(gx, gy, gz), max_voxels=V,
                reduce='mean')
            return p, p2v, vcoords

        pts, p2v, vcoords = jax.vmap(one)(points, points_mask)
        # flatten batch with voxel-id offsets
        offs = (jnp.arange(B, dtype=jnp.int32) * V)[:, None]
        p2v_flat = jnp.where(p2v >= 0, p2v + offs, -1).reshape(B * P)
        pts_flat = pts.reshape(B * P, C)
        bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), V).reshape(B, V, 1)
        coords4 = jnp.concatenate(
            [jnp.where(vcoords[..., :1] >= 0, bidx, -1), vcoords],
            -1).reshape(B * V, 4)
        vf = self._voxel_encoder(pts_flat, p2v_flat, B * V, coords4,
                                 train=train)
        x = self._middle_encoder(vf, coords4, B, train=train)
        x = self._backbone(x, train=train)
        if self._neck is not None:
            x = self._neck(x, train=train)
        return x
