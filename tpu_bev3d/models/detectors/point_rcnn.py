"""PointRCNN two-stage point-based detector.

Ref: mmdet3d/models/detectors/point_rcnn.py:12-80 — PointNet++ backbone
with FP decoding → PointRPNHead per-point proposals → PointRCNNRoIHead
canonical refinement.
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ...registry import MODELS


@MODELS.register_module()
class PointRCNN(nn.Module):
    backbone: Any = None
    rpn_head: Any = None
    roi_head: Any = None

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._rpn_head = MODELS.build(dict(self.rpn_head))
        self._roi_head = MODELS.build(dict(self.roi_head))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        feat_dict = self._backbone(batch['points'], batch['points_mask'],
                                   train=train)
        preds = self._rpn_head(feat_dict, train=train)
        proposals = self._rpn_head.predict_by_feat(preds, feat_dict)
        refined = self._roi_head(feat_dict, proposals, train=train)
        if mode == 'tensor':
            return refined
        if mode == 'loss':
            losses = self._rpn_head.loss_by_feat(
                preds, feat_dict, batch['gt_bboxes_3d'],
                batch['gt_labels_3d'], batch['gt_mask'])
            losses.update(self._roi_head.loss(
                refined, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask']))
            return losses
        if mode == 'predict':
            return {k: v for k, v in refined.items()
                    if not k.startswith('_')}
        raise ValueError(mode)
