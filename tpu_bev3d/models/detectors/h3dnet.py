"""H3DNet detector: proposals + geometric primitives + matching refine.

Ref: mmdet3d/models/detectors/h3dnet.py — PointNet2 backbone, VoteNet
proposal head, three PrimitiveHeads (z-faces / xy-faces / edge lines),
H3DRoIHead refining proposals by primitive agreement.
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ...registry import MODELS


@MODELS.register_module()
class H3DNet(nn.Module):
    backbone: Any = None
    proposal_head: Any = None          # VoteHead cfg
    primitive_z: Any = None
    primitive_xy: Any = None
    primitive_line: Any = None
    roi_head: Any = None

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._proposal_head = MODELS.build(dict(self.proposal_head))
        self._prim_z = MODELS.build(dict(self.primitive_z))
        self._prim_xy = MODELS.build(dict(self.primitive_xy))
        self._prim_line = MODELS.build(dict(self.primitive_line))
        self._roi_head = MODELS.build(dict(self.roi_head))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        feat = self._backbone(batch['points'], batch['points_mask'],
                              train=train)
        res = self._proposal_head(feat, train=train)
        prim_outs = {'z': self._prim_z(feat, train=train),
                     'xy': self._prim_xy(feat, train=train),
                     'line': self._prim_line(feat, train=train)}
        proposals = self._proposal_head.predict_by_feat(res)
        refined = self._roi_head(proposals, prim_outs, train=train)
        if mode == 'tensor':
            return refined
        if mode == 'loss':
            losses = self._proposal_head.loss_by_feat(
                res, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
            for ph, po in ((self._prim_z, prim_outs['z']),
                           (self._prim_xy, prim_outs['xy']),
                           (self._prim_line, prim_outs['line'])):
                losses.update(ph.loss(po, batch['gt_bboxes_3d'],
                                      batch['gt_mask']))
            losses.update(self._roi_head.loss(
                refined, batch['gt_bboxes_3d'], batch['gt_mask']))
            return losses
        if mode == 'predict':
            return {k: v for k, v in refined.items()
                    if not k.startswith('_')}
        raise ValueError(mode)
