"""FCOS3D monocular detector (ref: mmdet3d/models/detectors/fcos_mono3d.py
— single-image anchor-free mono 3D).

Batch contract: imgs [B, H, W, 3], cam2img [B, 3, 3], GT boxes in CAMERA
frame [B, G, 7].
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ...registry import MODELS


@MODELS.register_module()
class FCOSMono3D(nn.Module):
    img_backbone: Any = None
    img_neck: Any = None
    bbox_head: Any = None

    def setup(self):
        self._backbone = MODELS.build(dict(self.img_backbone))
        self._neck = MODELS.build(dict(self.img_neck)) \
            if self.img_neck else None
        self._bbox_head = MODELS.build(dict(self.bbox_head))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        feats = self._backbone(batch['imgs'], train=train)
        if self._neck is not None:
            feats = self._neck(feats, train=train)
        outs = self._bbox_head(feats, train=train)
        if mode == 'tensor':
            return outs
        if mode == 'loss':
            return self._bbox_head.loss_by_feat(
                outs, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'], batch['cam2img'])
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(outs, batch['cam2img'])
        raise ValueError(mode)
