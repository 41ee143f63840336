"""FCOS3D monocular 3D detection head.

Ref: mmdet3d/models/dense_heads/fcos_mono3d_head.py (+ anchor_free_mono3d
base): per-pixel anchor-free predictions on FPN levels — class scores,
centerness, 2D-center offset, depth, dims, rotation — decoded to
camera-frame 3D boxes via the intrinsics.

TPU design: targets are assigned center-based inside jit (each GT claims
the nearest pixel of the level matched to its projected size — the
CenterNet-style specialization of FCOS3D's center sampling); all losses are
masked fixed-shape reductions.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct
from ..losses.losses import (l1_loss, sigmoid_focal_loss,
                             binary_cross_entropy_with_logits,
                             smooth_l1_loss)


@MODELS.register_module()
class FCOSMono3DHead(nn.Module):
    num_classes: int = 10
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    strides: Sequence[int] = (8, 16, 32)
    # bbox_code: offset(2) + depth(1) + size(3) + rot sin/cos(2)
    depth_log: bool = True
    # PGD-style learned depth uncertainty (ref pgd_head.py — an extra
    # log-sigma channel weights the depth loss via UncertainSmoothL1)
    depth_uncertainty: bool = False
    score_thr: float = 0.05
    max_num: int = 100
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    loss_centerness_weight: float = 1.0
    loss_depth_weight: float = 1.0

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: tuple of NHWC maps (fine→coarse) → list of per-level
        dicts."""
        outs = []
        for li, x in enumerate(feats[:len(self.strides)]):
            h_cls = x
            h_reg = x
            for i in range(self.stacked_convs):
                h_cls = ConvBNAct(self.feat_channels, 3, padding=1,
                                  name=f'cls_conv{li}_{i}')(h_cls, train)
                h_reg = ConvBNAct(self.feat_channels, 3, padding=1,
                                  name=f'reg_conv{li}_{i}')(h_reg, train)
            cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                          bias_init=nn.initializers.constant(-4.6),
                          name=f'cls_out{li}')(h_cls)
            ctr = nn.Conv(1, (3, 3), padding=1,
                          name=f'ctr_out{li}')(h_reg)
            reg = nn.Conv(8, (3, 3), padding=1,
                          name=f'reg_out{li}')(h_reg)
            out = dict(cls=cls, centerness=ctr, reg=reg)
            if self.depth_uncertainty:
                out['depth_sigma'] = nn.Conv(
                    1, (3, 3), padding=1, name=f'sigma_out{li}')(h_reg)
            outs.append(out)
        return outs

    # --------------------------------------------------------------- decode

    def _decode_level(self, out, stride, cam2img):
        """→ boxes [B, H·W, 7] cam-frame + scores [B, H·W, K]."""
        cls, ctr, reg = out['cls'], out['centerness'], out['reg']
        B, H, W, K = cls.shape
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32),
                              indexing='ij')
        u = (gx + 0.5) * stride + reg[..., 0]
        v = (gy + 0.5) * stride + reg[..., 1]
        depth = jnp.exp(reg[..., 2]) if self.depth_log else reg[..., 2]
        fx = cam2img[:, 0, 0][:, None, None]
        fy = cam2img[:, 1, 1][:, None, None]
        cx = cam2img[:, 0, 2][:, None, None]
        cy = cam2img[:, 1, 2][:, None, None]
        x3 = (u - cx) / fx * depth
        y3 = (v - cy) / fy * depth
        dims = jnp.exp(jnp.clip(reg[..., 3:6], -5, 5))
        yaw = jnp.arctan2(reg[..., 6], reg[..., 7])
        boxes = jnp.concatenate(
            [x3[..., None], y3[..., None], depth[..., None], dims,
             yaw[..., None]], -1).reshape(B, H * W, 7)
        scores = (jax.nn.sigmoid(cls)
                  * jax.nn.sigmoid(ctr)).reshape(B, H * W, K)
        return boxes, scores

    def predict_by_feat(self, outs, cam2img):
        boxes_all, scores_all = [], []
        for out, s in zip(outs, self.strides):
            b, sc = self._decode_level(out, s, cam2img)
            boxes_all.append(b)
            scores_all.append(sc)
        boxes = jnp.concatenate(boxes_all, 1)
        scores = jnp.concatenate(scores_all, 1)
        B, N, K = scores.shape
        flat = scores.reshape(B, N * K)
        top, idx = jax.lax.top_k(flat, self.max_num)
        sel = jax.vmap(lambda bb, ii: bb[ii])(boxes, idx // K)
        return dict(bboxes=sel, scores=top, labels=idx % K,
                    mask=top > self.score_thr)

    # ----------------------------------------------------------------- loss

    def loss_by_feat(self, outs, gt_bboxes, gt_labels, gt_mask, cam2img):
        """GT boxes are CAMERA-frame [B, G, 7] (x right, y down, z fwd)."""
        losses = {}
        fx = cam2img[:, 0, 0]
        fy = cam2img[:, 1, 1]
        cx = cam2img[:, 0, 2]
        cy = cam2img[:, 1, 2]
        z = jnp.maximum(gt_bboxes[..., 2], 0.5)
        u = gt_bboxes[..., 0] / z * fx[:, None] + cx[:, None]
        v = gt_bboxes[..., 1] / z * fy[:, None] + cy[:, None]
        # level assignment by projected size (bigger → coarser)
        proj_size = gt_bboxes[..., 3] / z * fx[:, None]
        n_lvl = len(self.strides)
        lvl = jnp.clip(
            jnp.floor(jnp.log2(jnp.maximum(proj_size, 1.0) / 16.0)),
            0, n_lvl - 1).astype(jnp.int32)

        total_cls = total_reg = total_ctr = 0.0
        total_depth = 0.0
        for li, (out, stride) in enumerate(zip(outs, self.strides)):
            cls, ctr, reg = out['cls'], out['centerness'], out['reg']
            sigma = out.get('depth_sigma')
            B, H, W, K = cls.shape

            def one(cls_s, ctr_s, reg_s, sg_s, gu, gv, gtb, gtl, gtm, glvl,
                    fx_, fy_, cx_, cy_):
                ok = gtm & (glvl == li) & (gtb[:, 2] > 0.5)
                iu = jnp.clip(jnp.floor(gu / stride), 0,
                              W - 1).astype(jnp.int32)
                iv = jnp.clip(jnp.floor(gv / stride), 0,
                              H - 1).astype(jnp.int32)
                pix = iv * W + iu                      # [G]
                G = gtb.shape[0]
                # heatmap-style cls: one-hot at assigned pixels
                tgt_cls = jnp.zeros((H * W, K))
                tgt_cls = tgt_cls.at[
                    jnp.where(ok, pix, H * W)[:, None],
                    jnp.clip(gtl, 0)[:, None]].max(
                        jnp.ones((G, 1)), mode='drop')
                l_cls = jnp.sum(sigmoid_focal_loss(
                    cls_s.reshape(H * W, K), tgt_cls))
                npos = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)
                # regression at assigned pixels
                rflat = reg_s.reshape(H * W, 8)
                rg = rflat[jnp.clip(pix, 0, H * W - 1)]
                du = gu - (iu + 0.5) * stride
                dv = gv - (iv + 0.5) * stride
                tgt = jnp.concatenate(
                    [du[:, None], dv[:, None],
                     jnp.log(jnp.maximum(gtb[:, 2:3], 1e-3)),
                     jnp.log(jnp.maximum(gtb[:, 3:6], 1e-3)),
                     jnp.sin(gtb[:, 6:7]), jnp.cos(gtb[:, 6:7])], -1)
                l_reg = jnp.sum(
                    smooth_l1_loss(rg, tgt)
                    * ok[:, None].astype(rg.dtype)) / npos
                # centerness: 1 at assigned pixels, BCE elsewhere-positive
                cflat = ctr_s.reshape(H * W)
                tgt_ctr = jnp.zeros((H * W,)).at[
                    jnp.where(ok, pix, H * W)].max(
                        jnp.ones((G,)), mode='drop')
                l_ctr = jnp.mean(binary_cross_entropy_with_logits(
                    cflat, tgt_ctr))
                # PGD depth-uncertainty term (ref pgd_head uncertain depth)
                sgl = sg_s.reshape(H * W)[jnp.clip(pix, 0, H * W - 1)]
                d_err = smooth_l1_loss(
                    rg[:, 2], jnp.log(jnp.maximum(gtb[:, 2], 1e-3)))
                l_depth = jnp.sum(
                    (jnp.exp(-sgl) * d_err + 0.5 * sgl)
                    * ok.astype(d_err.dtype)) / npos
                return l_cls / npos, l_reg, l_ctr, l_depth

            sg = sigma if sigma is not None else jnp.zeros_like(ctr)
            l_cls, l_reg, l_ctr, l_depth = jax.vmap(one)(
                cls, ctr, reg, sg, u, v, gt_bboxes, gt_labels, gt_mask,
                lvl, fx, fy, cx, cy)
            total_cls += jnp.mean(l_cls)
            total_reg += jnp.mean(l_reg)
            total_ctr += jnp.mean(l_ctr)
            total_depth += jnp.mean(l_depth)
        losses['loss_cls'] = self.loss_cls_weight * total_cls
        losses['loss_bbox'] = self.loss_bbox_weight * total_reg
        losses['loss_centerness'] = \
            self.loss_centerness_weight * total_ctr
        if self.depth_uncertainty:
            losses['loss_depth'] = self.loss_depth_weight * total_depth
        return losses
