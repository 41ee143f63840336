"""Two-stage 3D detector: first-stage proposals + BEV RoI refinement.

Ref: mmdet3d/models/detectors/two_stage.py / parta2.py / pv_rcnn.py —
RPN proposals from the dense head, refined by a roi_head. Here the first
stage is any registered single-stage pipeline (CenterPoint-style) and the
second stage is BEVGridRoIHead over the neck's BEV features.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from .voxelnet import VoxelNet


@MODELS.register_module()
class TwoStage3DDetector(VoxelNet):
    roi_head: Any = None

    def setup(self):
        super().setup()
        self._roi_head = MODELS.build(dict(self.roi_head))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        feats = self.extract_feat(batch['points'], batch['points_mask'],
                                  train=train)
        outs = self._bbox_head(feats, train=train)
        proposals = self._bbox_head.predict_by_feat(outs)
        refined = self._roi_head(feats, proposals, train=train)
        if mode == 'tensor':
            return refined
        if mode == 'loss':
            losses = self._bbox_head.loss_by_feat(
                outs, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
            losses.update(self._roi_head.loss(
                refined, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask']))
            return losses
        if mode == 'predict':
            return {k: v for k, v in refined.items()
                    if not k.startswith('_')}
        raise ValueError(mode)
