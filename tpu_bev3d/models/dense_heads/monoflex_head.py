"""MonoFlex monocular 3D head.

Ref: mmdet3d/models/dense_heads/monoflex_head.py:1-804 + the MonoFlex
bbox coder — CenterNet-style heatmap with EDGE FUSION (border features
get their own 1D conv and are fused back, handling truncated objects),
and the MonoFlex decomposition: 2D box, sub-pixel offset, 10 projected
keypoints, dims, MULTIBIN orientation (4 bins, cls + sin/cos residual),
and depth from an UNCERTAINTY ENSEMBLE of the direct estimate and three
keypoint-geometry solvers (center / diagonal pairs: depth = f·H3D / h2D).

TPU design: fixed top-k peak decode like SMOKE; all losses fixed-shape
over padded GT tables.

Regression layout (50 ch):
  [0:4]   2D ltrb      [4:6]  center offset  [6:26] 10 kpt offsets
  [26:29] log-dim res  [29:37] bin cls (4×2)  [37:45] bin sin/cos
  [45]    direct depth [46]   direct logvar   [47:50] kpt-depth logvars
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct
from ..losses.losses import (gaussian_focal_loss, l1_loss,
                             softmax_cross_entropy)
from .centerpoint_head import draw_heatmap, gaussian_radius

NUM_KPT = 10
REG_CH = 50
NUM_BINS = 4
BIN_CENTERS = np.arange(NUM_BINS) * (2 * np.pi / NUM_BINS)


class EdgeFusion(nn.Module):
    """Border-feature fusion (ref monoflex_head.py edge fusion module):
    gather the feature map's border ring as a 1D sequence, run a 1D conv,
    scatter-add back."""
    channels: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        top = x[:, 0, :, :]
        bottom = x[:, H - 1, :, :]
        left = x[:, :, 0, :]
        right = x[:, :, W - 1, :]
        seq = jnp.concatenate([top, right, bottom[:, ::-1],
                               left[:, ::-1]], 1)          # [B, 2H+2W, C]
        seq = nn.Conv(self.channels, (3,), padding='SAME',
                      name='edge_conv1')(seq)
        seq = nn.relu(seq)
        seq = nn.Conv(C, (3,), padding='SAME', name='edge_conv2')(seq)
        t, r = seq[:, :W], seq[:, W:W + H]
        b = seq[:, W + H:W + H + W][:, ::-1]
        l = seq[:, W + H + W:][:, ::-1]
        x = x.at[:, 0, :, :].add(t)
        x = x.at[:, H - 1, :, :].add(b)
        x = x.at[:, :, 0, :].add(l)
        x = x.at[:, :, W - 1, :].add(r)
        return x


def box_kpts_cam(boxes):
    """Camera-frame boxes [.., 7] (x, y(down), z, l, h, w, ry; gravity
    center) → 10 keypoints [.., 10, 3]: 8 corners + top/bottom centers."""
    l, h, w = boxes[..., 3], boxes[..., 4], boxes[..., 5]
    template = jnp.asarray(
        [[1, 1, 1], [1, 1, -1], [-1, 1, -1], [-1, 1, 1],
         [1, -1, 1], [1, -1, -1], [-1, -1, -1], [-1, -1, 1],
         [0, -1, 0], [0, 1, 0]], jnp.float32) * 0.5
    dims = jnp.stack([l, h, w], -1)
    local = template * dims[..., None, :]
    ry = boxes[..., 6]
    c, s = jnp.cos(ry), jnp.sin(ry)
    x = local[..., 0] * c[..., None] + local[..., 2] * s[..., None]
    z = -local[..., 0] * s[..., None] + local[..., 2] * c[..., None]
    return jnp.stack([x, local[..., 1], z], -1) + boxes[..., None, :3]


@MODELS.register_module()
class MonoFlexHead(nn.Module):
    num_classes: int = 3
    in_channels: int = 64
    feat_channels: int = 64
    stride: int = 4
    max_num: int = 64
    score_thr: float = 0.25
    use_edge_fusion: bool = True
    uncertainty_range: Sequence[float] = (-10.0, 10.0)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[0] if isinstance(feats, (tuple, list)) else feats
        h = ConvBNAct(self.feat_channels, 3, padding=1, name='conv')(
            x, train)
        if self.use_edge_fusion:
            h = EdgeFusion(self.feat_channels, name='edge')(h)
        heatmap = nn.Conv(self.num_classes, (3, 3), padding=1,
                          bias_init=nn.initializers.constant(-2.19),
                          name='hm')(h)
        reg = nn.Conv(REG_CH, (3, 3), padding=1, name='reg')(h)
        return dict(heatmap=heatmap, reg=reg)

    # ------------------------------------------------------------- decode

    def _ensemble_depth(self, r, fy):
        """Direct + 3 keypoint-geometric depths, inverse-variance softmax
        ensemble (ref coder decode_depth_from_keypoints + combine)."""
        direct = 1.0 / jax.nn.sigmoid(r[..., 45]) - 1.0
        kpts = r[..., 6:26].reshape(r.shape[:-1] + (NUM_KPT, 2))
        dims_h = jnp.exp(jnp.clip(r[..., 27], -3, 3))  # placeholder scale
        # pixel heights of the 3 vertical pairs: center (8,9), diagonals
        h_c = jnp.abs(kpts[..., 9, 1] - kpts[..., 8, 1])
        h_d1 = 0.5 * (jnp.abs(kpts[..., 0, 1] - kpts[..., 4, 1])
                      + jnp.abs(kpts[..., 2, 1] - kpts[..., 6, 1]))
        h_d2 = 0.5 * (jnp.abs(kpts[..., 1, 1] - kpts[..., 5, 1])
                      + jnp.abs(kpts[..., 3, 1] - kpts[..., 7, 1]))
        f = fy[:, None] / self.stride
        depths = jnp.stack([
            direct,
            f * dims_h / jnp.maximum(h_c, 0.1),
            f * dims_h / jnp.maximum(h_d1, 0.1),
            f * dims_h / jnp.maximum(h_d2, 0.1)], -1)
        logvar = jnp.clip(
            jnp.concatenate([r[..., 46:47], r[..., 47:50]], -1),
            *self.uncertainty_range)
        wgt = jax.nn.softmax(-logvar, -1)
        return jnp.sum(depths * wgt, -1), logvar

    def _decode_common(self, out, cam2img, dim_ref=None):
        hm = jax.nn.sigmoid(out['heatmap'])
        B, H, W, K = hm.shape
        pooled = nn.max_pool(hm, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        peaks = jnp.where(hm == pooled, hm, 0.0)
        top, idx = jax.lax.top_k(peaks.reshape(B, -1), self.max_num)
        cls = idx % K
        pix = idx // K
        ys = (pix // W).astype(jnp.float32)
        xs = (pix % W).astype(jnp.float32)
        rflat = out['reg'].reshape(B, H * W, REG_CH)
        r = jax.vmap(lambda m, i: m[i])(rflat, pix)
        fx = cam2img[:, 0, 0][:, None]
        fy = cam2img[:, 1, 1][:, None]
        cx = cam2img[:, 0, 2][:, None]
        cy = cam2img[:, 1, 2][:, None]
        depth, _ = self._ensemble_depth(r, cam2img[:, 1, 1])
        u = (xs + r[..., 4]) * self.stride
        v = (ys + r[..., 5]) * self.stride
        x3 = (u - cx) / fx * depth
        y3 = (v - cy) / fy * depth
        dims = jnp.exp(jnp.clip(r[..., 26:29], -3, 3))
        # multibin orientation → alpha → global yaw
        bin_cls = r[..., 29:37].reshape(B, -1, NUM_BINS, 2)
        bin_best = jnp.argmax(bin_cls[..., 1] - bin_cls[..., 0], -1)
        sc = r[..., 37:45].reshape(B, -1, NUM_BINS, 2)
        sb = jnp.take_along_axis(sc, bin_best[..., None, None]
                                 .repeat(2, -1), 2)[..., 0, :]
        alpha = jnp.asarray(BIN_CENTERS)[bin_best] \
            + jnp.arctan2(sb[..., 0], sb[..., 1])
        yaw = alpha + jnp.arctan2(x3, jnp.maximum(depth, 0.5))
        boxes = jnp.concatenate(
            [x3[..., None], y3[..., None], depth[..., None], dims,
             yaw[..., None]], -1)
        return boxes, top, cls

    def predict_by_feat(self, out, cam2img):
        boxes, scores, cls = self._decode_common(out, cam2img)
        return dict(bboxes=boxes, scores=scores, labels=cls,
                    mask=scores > self.score_thr)

    # --------------------------------------------------------------- loss

    def loss_by_feat(self, out, gt_bboxes, gt_labels, gt_mask, cam2img):
        """GT camera-frame gravity-centered boxes [B, G, 7]."""
        hm = jnp.clip(jax.nn.sigmoid(out['heatmap']), 1e-4, 1 - 1e-4)
        B, H, W, K = hm.shape
        fx = cam2img[:, 0, 0][:, None]
        fy = cam2img[:, 1, 1][:, None]
        cx = cam2img[:, 0, 2][:, None]
        cy = cam2img[:, 1, 2][:, None]
        z = jnp.maximum(gt_bboxes[..., 2], 0.5)
        u = (gt_bboxes[..., 0] / z * fx + cx) / self.stride
        v = (gt_bboxes[..., 1] / z * fy + cy) / self.stride
        ok = gt_mask & (u >= 0) & (u < W) & (v >= 0) & (v < H) \
            & (gt_bboxes[..., 2] > 0.5)
        size_pix = gt_bboxes[..., 3] / z * fx / self.stride

        def hm_one(uu, vv, sp, lbl, okm):
            rr = jnp.maximum(2.0, gaussian_radius(
                jnp.stack([sp, sp], -1), 0.3))
            return jnp.stack([
                draw_heatmap(H, W, jnp.stack([uu, vv], -1), rr,
                             okm & (lbl == c)) for c in range(K)], -1)

        hm_tgt = jax.vmap(hm_one)(u, v, size_pix, gt_labels, ok)
        npos_hm = jnp.maximum(jnp.sum((hm_tgt == 1).astype(jnp.float32)),
                              1.0)
        l_hm = jnp.sum(gaussian_focal_loss(hm, hm_tgt)) / npos_hm

        iu = jnp.clip(jnp.floor(u), 0, W - 1).astype(jnp.int32)
        iv = jnp.clip(jnp.floor(v), 0, H - 1).astype(jnp.int32)
        pix = iv * W + iu
        rflat = out['reg'].reshape(B, H * W, REG_CH)
        r = jax.vmap(lambda m, i: m[i])(rflat, pix)
        wk = ok.astype(jnp.float32)
        nk = jnp.maximum(jnp.sum(wk), 1.0)

        # offsets + dims
        l_off = jnp.sum(l1_loss(
            jnp.stack([r[..., 4], r[..., 5]], -1),
            jnp.stack([u - iu, v - iv], -1)) * wk[..., None]) / nk
        l_dim = jnp.sum(l1_loss(
            r[..., 26:29],
            jnp.log(jnp.maximum(gt_bboxes[..., 3:6], 1e-3)))
            * wk[..., None]) / nk
        # keypoints: project GT 3D keypoints to featmap-relative offsets
        kpts3 = box_kpts_cam(gt_bboxes[..., :7])           # [B,G,10,3]
        kz = jnp.maximum(kpts3[..., 2], 0.5)
        ku = (kpts3[..., 0] / kz * fx[..., None] + cx[..., None]) \
            / self.stride
        kv = (kpts3[..., 1] / kz * fy[..., None] + cy[..., None]) \
            / self.stride
        kpt_tgt = jnp.stack([ku - iu[..., None], kv - iv[..., None]], -1)
        kpt_pred = r[..., 6:26].reshape(B, -1, NUM_KPT, 2)
        vis = (ku >= 0) & (ku < W) & (kv >= 0) & (kv < H) & ok[..., None]
        l_kpt = jnp.sum(l1_loss(kpt_pred, kpt_tgt)
                        * vis[..., None]) \
            / jnp.maximum(jnp.sum(vis.astype(jnp.float32)), 1.0)
        # multibin orientation on alpha
        alpha = gt_bboxes[..., 6] - jnp.arctan2(
            gt_bboxes[..., 0], jnp.maximum(gt_bboxes[..., 2], 0.5))
        diff = (alpha[..., None] - jnp.asarray(BIN_CENTERS)[None, None]) \
            % (2 * np.pi)
        diff = jnp.where(diff > np.pi, diff - 2 * np.pi, diff)
        in_bin = (jnp.abs(diff) < (np.pi / NUM_BINS + 0.1))
        bin_cls = r[..., 29:37].reshape(B, -1, NUM_BINS, 2)
        l_bin = jnp.sum(
            softmax_cross_entropy(
                bin_cls, in_bin.astype(jnp.int32))
            * wk[..., None]) / (nk * NUM_BINS)
        sc = r[..., 37:45].reshape(B, -1, NUM_BINS, 2)
        sc_tgt = jnp.stack([jnp.sin(diff), jnp.cos(diff)], -1)
        l_res = jnp.sum(l1_loss(sc, sc_tgt) * (in_bin & ok[..., None])
                        [..., None]) \
            / jnp.maximum(jnp.sum(in_bin & ok[..., None]), 1.0)
        # uncertainty-weighted depth (Laplacian NLL, ref uncertainty loss)
        depth, logvar = self._ensemble_depth(r, cam2img[:, 1, 1])
        direct = 1.0 / jax.nn.sigmoid(r[..., 45]) - 1.0
        gt_z = gt_bboxes[..., 2]
        l_depth = jnp.sum(
            (jnp.abs(direct - gt_z) * jnp.exp(-logvar[..., 0])
             + logvar[..., 0]) * wk) / nk
        l_depth_comb = jnp.sum(jnp.abs(depth - gt_z) * wk) / nk
        return dict(loss_heatmap=l_hm, loss_offset=l_off,
                    loss_dim=l_dim, loss_kpt=l_kpt,
                    loss_ori_bin=l_bin, loss_ori_res=l_res,
                    loss_depth=l_depth, loss_depth_combined=l_depth_comb)


@MODELS.register_module()
class MonoFlex(nn.Module):
    """MonoFlex detector shell (ref mmdet3d/models/detectors/monoflex.py)."""
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
