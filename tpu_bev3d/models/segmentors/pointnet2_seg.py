"""PointNet++ semantic segmentor + test-time augmentation wrapper.

Refs: mmdet3d/models/segmentors/encoder_decoder.py with
PointNet2SASSG backbone + decode_heads/pointnet2_head.py (FP decoding to
full resolution, per-point classifier), and models/segmentors/seg3d_tta.py
(Seg3DTTAModel — average the per-point class probabilities over
augmented views).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..layers.pointnet_modules import PointFPModule, SharedMLP
from ..losses.losses import softmax_cross_entropy


@MODELS.register_module()
class PointNet2Seg(nn.Module):
    """Encoder-decoder point segmentor (ref encoder_decoder.py +
    pointnet2_head.py). The backbone must return fp features at FULL
    input resolution (configure fp_channels accordingly)."""
    backbone: Any = None
    num_classes: int = 13
    channels: Sequence[int] = (128,)
    dropout: float = 0.5
    ignore_index: int = 255

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._pre = SharedMLP(tuple(self.channels))
        self._cls = nn.Dense(self.num_classes)

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        points, points_mask = batch['points'], batch['points_mask']
        feat = self._backbone(points, points_mask, train=train)
        h = self._pre(feat['fp_features'], feat['fp_mask'], train)
        logits = self._cls(h)                      # [B, S, K]
        valid = feat['fp_mask']
        if mode == 'tensor':
            return logits
        if mode == 'loss':
            labels = batch['pts_semantic_mask']
            # backbone decodes to its own resolution; when S == P the
            # labels align 1:1 (full-resolution fp_channels)
            labels = labels[:, :logits.shape[1]]
            w = valid & (labels != self.ignore_index)
            ce = softmax_cross_entropy(
                logits, jnp.clip(labels, 0, self.num_classes - 1))
            return dict(loss_sem_seg=jnp.sum(ce * w)
                        / jnp.maximum(jnp.sum(w), 1.0))
        if mode == 'predict':
            return dict(pts_semantic_mask=jnp.argmax(logits, -1),
                        logits=logits, mask=valid)
        raise ValueError(mode)


@MODELS.register_module()
class Seg3DTTAModel(nn.Module):
    """Test-time augmentation for 3D segmentors (ref seg3d_tta.py):
    run the wrapped segmentor on flipped/rotated copies of the points and
    average the per-point class probabilities. Augmented views are
    geometric-only, so per-point correspondence is exact."""
    segmentor: Any = None
    flip_x: bool = True
    flip_y: bool = True

    def setup(self):
        self._seg = MODELS.build(dict(self.segmentor))

    def _views(self, points):
        views = [points]
        if self.flip_x:
            v = points.at[..., 0].multiply(-1)
            views.append(v)
        if self.flip_y:
            v = points.at[..., 1].multiply(-1)
            views.append(v)
        return views

    def __call__(self, batch, mode: str = 'predict',
                 train: bool = False):
        if mode != 'predict':
            return self._seg(batch, mode=mode, train=train)
        probs = None
        out = None
        for v in self._views(batch['points']):
            b = dict(batch)
            b['points'] = v
            out = self._seg(b, mode='predict', train=False)
            p = jax.nn.softmax(out['logits'], -1)
            probs = p if probs is None else probs + p
        return dict(pts_semantic_mask=jnp.argmax(probs, -1),
                    logits=probs, mask=out['mask'])
