"""PV-RCNN two-stage detector.

Ref: mmdet3d/models/detectors/pv_rcnn.py:1-232 — voxelize → SparseEncoder
(middle feats kept) → SECOND/SECONDFPN BEV → RPN proposals; keypoints via
VoxelSetAbstraction over raw points + sparse stages + BEV; PVRCNNRoIHead
grid-pool refinement with predicted keypoint weighting.
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ...ops.voxelize import batch_hard_voxelize
from ...registry import MODELS


@MODELS.register_module()
class PVRCNN(nn.Module):
    voxel_encoder: Any = None
    middle_encoder: Any = None
    backbone: Any = None
    neck: Any = None
    rpn_head: Any = None
    points_encoder: Any = None       # VoxelSetAbstraction
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
        self._points_encoder = MODELS.build(dict(self.points_encoder))
        self._roi_head = MODELS.build(dict(self.roi_head))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        points, points_mask = batch['points'], batch['points_mask']
        B = points.shape[0]
        vox = batch_hard_voxelize(
            points, points_mask, voxel_size=tuple(self.voxel_size),
            pc_range=tuple(self.point_cloud_range),
            max_points=self.max_num_points,
            max_voxels_per_sample=self.max_voxels)
        vf = self._voxel_encoder(vox['voxels'], vox['num_points'],
                                 vox['coords'], train=train)
        bev, middle_feats = self._middle_encoder(vf, vox['coords'], B,
                                                 train=train)
        x = self._backbone(bev, train=train)
        if self._neck is not None:
            x = self._neck(x, train=train)
        outs = self._rpn_head(x, train=train)
        proposals = self._rpn_head.predict_by_feat(outs)
        kp_xyz, kp_feats, kp_mask = self._points_encoder(
            points, points_mask, middle_feats, x, train=train)
        refined = self._roi_head(kp_xyz, kp_feats, kp_mask, proposals,
                                 train=train)
        if mode == 'tensor':
            return refined
        if mode == 'loss':
            losses = {f'rpn_{k}': v for k, v in
                      self._rpn_head.loss_by_feat(
                          outs, batch['gt_bboxes_3d'],
                          batch['gt_labels_3d'], batch['gt_mask']).items()}
            losses.update(self._roi_head.loss(
                refined, kp_xyz, kp_mask, batch['gt_bboxes_3d'],
                batch['gt_labels_3d'], batch['gt_mask']))
            return losses
        if mode == 'predict':
            return {k: v for k, v in refined.items()
                    if not k.startswith('_')}
        raise ValueError(mode)
