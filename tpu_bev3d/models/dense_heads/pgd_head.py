"""PGD (Probabilistic and Geometric Depth) head — full version.

Ref: mmdet3d/models/dense_heads/pgd_head.py:1-1239 — FCOS3D base plus:
- probabilistic depth: per-pixel logits over depth bins (uniform or
  linear-increasing discretization), expectation fused with the direct
  regression through a learned per-pixel weight (ref depth fusion)
- a 2D ltrb bbox branch with targets from the projected 3D box, and a
  2D/3D consistency term (projected 3D center vs 2D box center)
- the depth-uncertainty weighting inherited from the FCOS3D base here
  (depth_uncertainty=True by default).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct
from ..losses.losses import smooth_l1_loss
from .fcos_mono3d_head import FCOSMono3DHead
from .monoflex_head import box_kpts_cam


def depth_bin_centers(num_bins, depth_range, mode='LID'):
    """LID = linear-increasing discretization (ref pgd utils)."""
    dmin, dmax = depth_range
    if mode == 'UD':
        return np.linspace(dmin, dmax, num_bins).astype(np.float32)
    i = np.arange(num_bins, dtype=np.float32)
    bin_size = 2 * (dmax - dmin) / (num_bins * (1 + num_bins))
    return (dmin + bin_size * i * (i + 1) / 2).astype(np.float32)


@MODELS.register_module()
class PGDHead(FCOSMono3DHead):
    num_depth_bins: int = 8
    depth_range: Sequence[float] = (1.0, 70.0)
    depth_bin_mode: str = 'LID'
    depth_uncertainty: bool = True
    with_bbox2d: bool = True
    loss_consistency_weight: float = 1.0
    loss_bbox2d_weight: float = 1.0

    @nn.compact
    def __call__(self, feats, train: bool = False):
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
            out['depth_sigma'] = nn.Conv(
                1, (3, 3), padding=1, name=f'sigma_out{li}')(h_reg)
            # probabilistic depth bins + fusion weight (ref depth_branch)
            out['depth_bins'] = nn.Conv(
                self.num_depth_bins, (3, 3), padding=1,
                name=f'depth_bin_out{li}')(h_reg)
            out['depth_weight'] = nn.Conv(
                1, (3, 3), padding=1, name=f'depth_w_out{li}')(h_reg)
            if self.with_bbox2d:
                out['bbox2d'] = nn.Conv(
                    4, (3, 3), padding=1, name=f'bbox2d_out{li}')(h_reg)
            outs.append(out)
        return outs

    def _fused_depth(self, out):
        """sigmoid(w)·direct + (1-sigmoid(w))·E[bins] (ref depth fusion)."""
        direct = jnp.exp(out['reg'][..., 2])
        centers = jnp.asarray(depth_bin_centers(
            self.num_depth_bins, self.depth_range, self.depth_bin_mode))
        prob = jax.nn.softmax(out['depth_bins'], -1)
        e_depth = jnp.sum(prob * centers, -1)
        w = jax.nn.sigmoid(out['depth_weight'][..., 0])
        return w * direct + (1 - w) * e_depth

    def _decode_level(self, out, stride, cam2img):
        cls, ctr, reg = out['cls'], out['centerness'], out['reg']
        B, H, W, K = cls.shape
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32),
                              indexing='ij')
        u = (gx + 0.5) * stride + reg[..., 0]
        v = (gy + 0.5) * stride + reg[..., 1]
        depth = self._fused_depth(out)
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

    def loss_by_feat(self, outs, gt_bboxes, gt_labels, gt_mask, cam2img):
        losses = super().loss_by_feat(outs, gt_bboxes, gt_labels, gt_mask,
                                      cam2img)
        fx = cam2img[:, 0, 0][:, None]
        fy = cam2img[:, 1, 1][:, None]
        cx = cam2img[:, 0, 2][:, None]
        cy = cam2img[:, 1, 2][:, None]
        z = jnp.maximum(gt_bboxes[..., 2], 0.5)
        u = gt_bboxes[..., 0] / z * fx + cx
        v = gt_bboxes[..., 1] / z * fy + cy
        proj_size = gt_bboxes[..., 3] / z * fx
        n_lvl = len(self.strides)
        lvl = jnp.clip(
            jnp.floor(jnp.log2(jnp.maximum(proj_size, 1.0) / 16.0)),
            0, n_lvl - 1).astype(jnp.int32)
        # projected 2D GT box from 3D corners
        kpts = box_kpts_cam(gt_bboxes[..., :7])[..., :8, :]
        kz = jnp.maximum(kpts[..., 2], 0.5)
        ku = kpts[..., 0] / kz * fx[..., None] + cx[..., None]
        kv = kpts[..., 1] / kz * fy[..., None] + cy[..., None]
        x1, x2 = jnp.min(ku, -1), jnp.max(ku, -1)
        y1, y2 = jnp.min(kv, -1), jnp.max(kv, -1)

        t_prob = t_2d = t_cons = 0.0
        for li, (out, stride) in enumerate(zip(outs, self.strides)):
            B, H, W, _ = out['cls'].shape
            e_depth_map = self._fused_depth(out).reshape(B, H * W)

            def one(ed, b2, gu, gv, gz, gx1, gy1, gx2, gy2, gtm, glvl):
                ok = gtm & (glvl == li) & (gz > 0.5)
                iu = jnp.clip(jnp.floor(gu / stride), 0,
                              W - 1).astype(jnp.int32)
                iv = jnp.clip(jnp.floor(gv / stride), 0,
                              H - 1).astype(jnp.int32)
                pix = iv * W + iu
                npos = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)
                dg = ed[jnp.clip(pix, 0, H * W - 1)]
                l_prob = jnp.sum(smooth_l1_loss(dg, gz) * ok) / npos
                if b2 is None:
                    return l_prob, 0.0, 0.0
                bb = b2.reshape(H * W, 4)[jnp.clip(pix, 0, H * W - 1)]
                px = (iu + 0.5) * stride
                py = (iv + 0.5) * stride
                tgt_ltrb = jnp.stack(
                    [px - gx1, py - gy1, gx2 - px, gy2 - py], -1) / stride
                l_2d = jnp.sum(smooth_l1_loss(bb, tgt_ltrb)
                               * ok[:, None]) / npos
                # consistency: predicted 2D box center vs projected GT ctr
                c2dx = px + (bb[:, 2] - bb[:, 0]) * stride / 2
                c2dy = py + (bb[:, 3] - bb[:, 1]) * stride / 2
                l_cons = jnp.sum((jnp.abs(c2dx - gu) + jnp.abs(c2dy - gv))
                                 / stride * ok) / npos
                return l_prob, l_2d, l_cons

            b2 = out.get('bbox2d')
            l_prob, l_2d, l_cons = jax.vmap(
                lambda *a: one(*a))(e_depth_map,
                                    b2 if b2 is not None else
                                    jnp.zeros((B, H, W, 4)),
                                    u, v, gt_bboxes[..., 2], x1, y1, x2,
                                    y2, gt_mask, lvl)
            t_prob += jnp.mean(l_prob)
            t_2d += jnp.mean(l_2d)
            t_cons += jnp.mean(l_cons)
        losses['loss_depth_prob'] = self.loss_depth_weight * t_prob
        if self.with_bbox2d:
            losses['loss_bbox2d'] = self.loss_bbox2d_weight * t_2d
            losses['loss_consistency'] = \
                self.loss_consistency_weight * t_cons
        return losses
