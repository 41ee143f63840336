"""Part-A² two-stage detector.

Ref: mmdet3d/models/detectors/parta2.py:14-100 — voxelize → SparseUNet →
SECOND/SECONDFPN BEV → PartA2RPNHead proposals; second stage =
PointwiseSemanticHead (seg + part, supervised from GT boxes) +
PartA2RoIHead (part-aggregation refinement). RPN here is the shared
Anchor3DHead (the reference's PartA2RPNHead is an Anchor3DHead variant
whose differences are proposal formatting, mmdet3d parta2_rpn_head.py).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import batch_hard_voxelize
from ...registry import MODELS


@MODELS.register_module()
class PartA2(nn.Module):
    voxel_encoder: Any = None
    middle_encoder: Any = None
    backbone: Any = None
    neck: Any = None
    rpn_head: Any = None
    seg_head: Any = None
    roi_head: Any = None
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)
    max_num_points: int = 5
    max_voxels: int = 16000

    def setup(self):
        self._voxel_encoder = MODELS.build(dict(self.voxel_encoder))
        self._middle_encoder = MODELS.build(dict(self.middle_encoder))
        self._backbone = MODELS.build(dict(self.backbone))
        self._neck = MODELS.build(dict(self.neck)) if self.neck else None
        self._rpn_head = MODELS.build(dict(self.rpn_head))
        self._seg_head = MODELS.build(dict(self.seg_head))
        self._roi_head = MODELS.build(dict(self.roi_head))

    def extract_feat(self, points, points_mask, train=False):
        B = points.shape[0]
        vox = batch_hard_voxelize(
            points, points_mask, voxel_size=tuple(self.voxel_size),
            pc_range=tuple(self.point_cloud_range),
            max_points=self.max_num_points,
            max_voxels_per_sample=self.max_voxels)
        vf = self._voxel_encoder(vox['voxels'], vox['num_points'],
                                 vox['coords'], train=train)
        unet_out = self._middle_encoder(vf, vox['coords'], B, train=train)
        x = self._backbone(unet_out['spatial_features'], train=train)
        if self._neck is not None:
            x = self._neck(x, train=train)
        seg_logit, part_reg = self._seg_head(unet_out['seg_features'])
        unet_out['seg_logit'] = seg_logit
        unet_out['part_reg'] = part_reg
        return x, unet_out

    def _voxel_xyz(self, coords):
        vsz = jnp.asarray(self.voxel_size)
        org = jnp.asarray(self.point_cloud_range[:3])
        return jnp.stack([
            coords[:, 3].astype(jnp.float32) * vsz[0] + vsz[0] / 2 + org[0],
            coords[:, 2].astype(jnp.float32) * vsz[1] + vsz[1] / 2 + org[1],
            coords[:, 1].astype(jnp.float32) * vsz[2] + vsz[2] / 2 + org[2],
        ], -1)

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        feats, unet_out = self.extract_feat(
            batch['points'], batch['points_mask'], train=train)
        outs = self._rpn_head(feats, train=train)
        proposals = self._rpn_head.predict_by_feat(outs)
        refined = self._roi_head(unet_out, proposals, train=train)
        if mode == 'tensor':
            return refined
        if mode == 'loss':
            losses = {f'rpn_{k}': v for k, v in
                      self._rpn_head.loss_by_feat(
                          outs, batch['gt_bboxes_3d'],
                          batch['gt_labels_3d'], batch['gt_mask']).items()}
            # per-sample voxel tables for the seg loss: coords carry the
            # batch index; group by masking
            coords = unet_out['seg_coords']
            xyz = self._voxel_xyz(coords)
            B = batch['points'].shape[0]
            V = coords.shape[0]
            xyz_b = jnp.broadcast_to(xyz[None], (B, V, 3))
            valid_b = (unet_out['seg_valid'][None]
                       & (coords[None, :, 0] == jnp.arange(B)[:, None]))
            seg_b = jnp.broadcast_to(unet_out['seg_logit'][None], (B, V))
            part_b = jnp.broadcast_to(unet_out['part_reg'][None],
                                      (B, V, 3))
            losses.update(self._seg_head.loss(
                seg_b, part_b, xyz_b, valid_b,
                batch['gt_bboxes_3d'], batch['gt_mask']))
            losses.update(self._roi_head.loss(
                refined, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask']))
            return losses
        if mode == 'predict':
            return {k: v for k, v in refined.items()
                    if not k.startswith('_')}
        raise ValueError(mode)
