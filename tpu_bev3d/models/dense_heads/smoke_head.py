"""SMOKE monocular head: single-stage keypoint-based mono 3D.

Ref: mmdet3d/models/dense_heads/smoke_mono3d_head.py — per-class center
heatmap (gaussian focal) + 8-channel regression at keypoints (depth
offset, sub-pixel center offset, dim residuals vs per-class priors,
yaw sin/cos); decode lifts each peak to 3D via the camera intrinsics.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct
from ..losses.losses import gaussian_focal_loss, l1_loss
from .centerpoint_head import draw_heatmap, gaussian_radius


@MODELS.register_module()
class SMOKEMono3DHead(nn.Module):
    num_classes: int = 3
    in_channels: int = 64
    feat_channels: int = 64
    stride: int = 4
    depth_ref: Sequence[float] = (28.01, 16.32)     # (mean, std)
    dim_ref: Any = ((3.88, 1.63, 1.53), (0.84, 1.76, 0.66),
                    (1.78, 1.70, 0.58))             # per-class (l, h, w)
    max_num: int = 64
    score_thr: float = 0.25

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[0] if isinstance(feats, (tuple, list)) else feats
        h = ConvBNAct(self.feat_channels, 3, padding=1, name='conv')(
            x, train)
        heatmap = nn.Conv(self.num_classes, (3, 3), padding=1,
                          bias_init=nn.initializers.constant(-2.19),
                          name='hm')(h)
        reg = nn.Conv(8, (3, 3), padding=1, name='reg')(h)
        return dict(heatmap=heatmap, reg=reg)

    def _decode_common(self, out, cam2img):
        hm = jax.nn.sigmoid(out['heatmap'])
        B, H, W, K = hm.shape
        pooled = nn.max_pool(hm, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        peaks = jnp.where(hm == pooled, hm, 0.0)
        flat = peaks.reshape(B, H * W * K)
        top, idx = jax.lax.top_k(flat, self.max_num)
        cls = idx % K
        pix = idx // K
        ys = (pix // W).astype(jnp.float32)
        xs = (pix % W).astype(jnp.float32)
        rflat = out['reg'].reshape(B, H * W, 8)
        r = jax.vmap(lambda m, i: m[i])(rflat, pix)       # [B, M, 8]
        mu, sigma = self.depth_ref
        depth = mu + r[..., 0] * sigma
        u = (xs + r[..., 1]) * self.stride
        v = (ys + r[..., 2]) * self.stride
        fx = cam2img[:, 0, 0][:, None]
        fy = cam2img[:, 1, 1][:, None]
        cx = cam2img[:, 0, 2][:, None]
        cy = cam2img[:, 1, 2][:, None]
        x3 = (u - cx) / fx * depth
        y3 = (v - cy) / fy * depth
        dims_ref = jnp.asarray(self.dim_ref)[cls]          # [B, M, 3]
        dims = dims_ref * jnp.exp(jnp.clip(r[..., 3:6], -2, 2))
        yaw = jnp.arctan2(r[..., 6], r[..., 7])
        boxes = jnp.concatenate(
            [x3[..., None], y3[..., None], depth[..., None], dims,
             yaw[..., None]], -1)
        return boxes, top, cls

    def predict_by_feat(self, out, cam2img):
        boxes, scores, cls = self._decode_common(out, cam2img)
        return dict(bboxes=boxes, scores=scores, labels=cls,
                    mask=scores > self.score_thr)

    def loss_by_feat(self, out, gt_bboxes, gt_labels, gt_mask, cam2img):
        """GT in CAMERA frame [B, G, 7]."""
        hm = jnp.clip(jax.nn.sigmoid(out['heatmap']), 1e-4, 1 - 1e-4)
        B, H, W, K = hm.shape
        fx = cam2img[:, 0, 0]
        fy = cam2img[:, 1, 1]
        cx = cam2img[:, 0, 2]
        cy = cam2img[:, 1, 2]
        z = jnp.maximum(gt_bboxes[..., 2], 0.5)
        u = (gt_bboxes[..., 0] / z * fx[:, None] + cx[:, None]) / self.stride
        v = (gt_bboxes[..., 1] / z * fy[:, None] + cy[:, None]) / self.stride
        ok = gt_mask & (u >= 0) & (u < W) & (v >= 0) & (v < H) \
            & (gt_bboxes[..., 2] > 0.5)
        size_pix = gt_bboxes[..., 3] / z * fx[:, None] / self.stride

        def hm_one(uu, vv, sp, lbl, okm):
            r = jnp.maximum(2.0, gaussian_radius(
                jnp.stack([sp, sp], -1), 0.3))
            ctr = jnp.stack([uu, vv], -1)
            return jnp.stack([
                draw_heatmap(H, W, ctr, r, okm & (lbl == c))
                for c in range(K)], -1)

        hm_tgt = jax.vmap(hm_one)(u, v, size_pix, gt_labels, ok)
        npos = jnp.maximum(jnp.sum((hm_tgt == 1).astype(jnp.float32)), 1.0)
        l_hm = jnp.sum(gaussian_focal_loss(hm, hm_tgt)) / npos

        # regression at GT keypoints
        iu = jnp.clip(jnp.floor(u), 0, W - 1).astype(jnp.int32)
        iv = jnp.clip(jnp.floor(v), 0, H - 1).astype(jnp.int32)
        pix = iv * W + iu
        rflat = out['reg'].reshape(B, H * W, 8)
        r = jax.vmap(lambda m, i: m[i])(rflat, pix)
        mu, sigma = self.depth_ref
        dims_ref = jnp.asarray(self.dim_ref)[jnp.clip(gt_labels, 0)]
        tgt = jnp.concatenate([
            ((gt_bboxes[..., 2] - mu) / sigma)[..., None],
            (u - iu)[..., None], (v - iv)[..., None],
            jnp.log(jnp.maximum(gt_bboxes[..., 3:6], 1e-3)
                    / dims_ref),
            jnp.sin(gt_bboxes[..., 6:7]), jnp.cos(gt_bboxes[..., 6:7]),
        ], -1)
        w = ok[..., None].astype(r.dtype)
        nk = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)
        l_reg = jnp.sum(l1_loss(r, tgt) * w) / nk
        return dict(loss_heatmap=l_hm, loss_bbox=l_reg)


@MODELS.register_module()
class SMOKEMono3D(nn.Module):
    """SMOKE detector shell (ref mmdet3d/models/detectors/smoke_mono3d.py).
    """
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
        out = self._bbox_head(feats, train=train)
        if mode == 'tensor':
            return out
        if mode == 'loss':
            return self._bbox_head.loss_by_feat(
                out, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'], batch['cam2img'])
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(out, batch['cam2img'])
        raise ValueError(mode)
