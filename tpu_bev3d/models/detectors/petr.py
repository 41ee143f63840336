"""PETR detector: camera-only multi-view 3D detection.

Ref: projects/PETR/petr/petr.py:21 (PETR(MVXTwoStageDetector) — img
backbone → neck → PETRHead). The TPU build reuses the registered image
backbones (SwinTransformer here; the reference's VoVNetCP is a config
choice) and GeneralizedLSSFPN/identity neck.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS


@MODELS.register_module()
class PETR(nn.Module):
    img_backbone: Any = None
    img_neck: Any = None
    bbox_head: Any = None
    image_size: Any = (256, 704)

    def setup(self):
        self._img_backbone = MODELS.build(dict(self.img_backbone))
        self._img_neck = MODELS.build(dict(self.img_neck)) \
            if self.img_neck else None
        self._bbox_head = MODELS.build(dict(self.bbox_head))

    def extract_feat(self, imgs, train: bool = False):
        B, N, H, W, C = imgs.shape
        x = imgs.reshape(B * N, H, W, C)
        feats = self._img_backbone(x, train=train)
        if self._img_neck is not None:
            feats = self._img_neck(feats, train=train)
        f = feats[0]
        fh, fw, fc = f.shape[1:]
        return f.reshape(B, N, fh, fw, fc)

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        feats = self.extract_feat(batch['imgs'], train=train)
        cam_params = {k: batch[k] for k in ('cam2lidar', 'intrins')
                      if k in batch}
        outs = self._bbox_head(feats, cam_params,
                               image_size=tuple(self.image_size),
                               train=train)
        if mode == 'tensor':
            return outs
        if mode == 'loss':
            return self._bbox_head.loss_by_feat(
                outs, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(outs)
        raise ValueError(mode)
