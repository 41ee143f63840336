"""Single-view 2D detector: backbone → FPN → YOLOXHead2D.

The repo's analogue of the reference's nuImages 2D family
(configs/nuimages/* train mmdet cascade-mask-rcnn/htc on the nuimages
converter output): the same converter pkls feed a fixed-shape YOLOX
detector (the 2D head StreamPETR already uses for auxiliary
supervision), optionally with a YOLACT-style prototype mask branch
(bbox_head mask_channels>0) covering the reference's instance-mask
training on the nuimage converter's COCO RLEs.

Batch contract: imgs [B, H, W, 3]; train adds gt_bboxes_2d [B, G, 4]
xyxy-pixels, gt_labels_2d [B, G], centers2d [B, G, 2] (defaults to box
centers when absent), gt_mask_2d [B, G], and optionally gt_masks_2d
[B, G, Hm, Wm] binary instance masks.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS


@MODELS.register_module()
class YOLOX2DDetector(nn.Module):
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    num_pred: int = 100      # predict-mode top-k detections
    score_thr: float = 0.01  # predict-mode validity threshold (ref
    #                          configs/nuimages score_thr=0.05/0.01)

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._neck = MODELS.build(dict(self.neck))
        self._bbox_head = MODELS.build(dict(self.bbox_head))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        feats = self._backbone(batch['imgs'], train=train)
        feats = self._neck(tuple(feats), train=train)
        outs = self._bbox_head(list(feats), train=train)
        if mode == 'tensor':
            return outs
        if mode == 'loss':
            gtb = batch['gt_bboxes_2d']
            c2d = batch.get('centers2d')
            if c2d is None:
                c2d = jnp.stack([(gtb[..., 0] + gtb[..., 2]) / 2,
                                 (gtb[..., 1] + gtb[..., 3]) / 2], -1)
            return self._bbox_head.loss_by_feat(
                outs, gtb, batch['gt_labels_2d'], c2d,
                batch['gt_mask_2d'],
                gt_masks=batch.get('gt_masks_2d'))
        if mode == 'predict':
            cls = jax.nn.sigmoid(outs['cls'])
            obj = jax.nn.sigmoid(outs['obj'])
            score = cls.max(-1) * obj                     # [B, P]
            labels = jnp.argmax(outs['cls'], -1)
            top, idx = jax.lax.top_k(score, self.num_pred)
            boxes = jnp.take_along_axis(outs['bboxes'], idx[..., None], 1)
            labs = jnp.take_along_axis(labels, idx, 1)
            pred = dict(bboxes=boxes, scores=top, labels=labs,
                        mask=top > self.score_thr)
            if 'protos' in outs:
                # instance masks: prototype combo for the top detections,
                # sigmoid + YOLACT box crop; [B, num_pred, Hp, Wp] at
                # proto_stride resolution
                coefs = jnp.take_along_axis(outs['mask_coefs'],
                                            idx[..., None], 1)
                m = jax.nn.sigmoid(jnp.einsum('bhwk,bqk->bqhw',
                                              outs['protos'], coefs))
                pred['masks'] = self._bbox_head.crop_masks(
                    m, boxes, outs['proto_stride'])
            return pred
        raise ValueError(mode)
