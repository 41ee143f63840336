"""VoteNet detector (ref: mmdet3d/models/detectors/votenet.py — indoor
point-based single stage: PointNet2 backbone → VoteHead)."""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ...registry import MODELS


@MODELS.register_module()
class VoteNet(nn.Module):
    backbone: Any = None
    bbox_head: Any = None

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._bbox_head = MODELS.build(dict(self.bbox_head))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        feat = self._backbone(batch['points'], batch['points_mask'],
                              train=train)
        res = self._bbox_head(feat, train=train)
        if mode == 'tensor':
            return res
        if mode == 'loss':
            return self._bbox_head.loss_by_feat(
                res, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(res)
        raise ValueError(mode)
