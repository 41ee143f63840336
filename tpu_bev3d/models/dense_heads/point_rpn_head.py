"""PointRPNHead — point-wise proposal head for PointRCNN.

Ref: mmdet3d/models/dense_heads/point_rpn_head.py:22-511 — per-point
class scores + box regression (center residual, log sizes, cos/sin yaw)
over FP point features; targets assigned by point-in-box with an
enlarged-box ignore band; prediction decodes per-point boxes and runs
class-agnostic NMS.

TPU design: fixed S points with validity mask; NMS emits fixed max_num
proposals + mask.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.nms import box3d_multiclass_nms
from ...registry import MODELS
from ..losses.losses import sigmoid_focal_loss, smooth_l1_loss
from ..roi_heads.part_aggregation_roi_head import points_in_boxes_local


@MODELS.register_module()
class PointRPNHead(nn.Module):
    num_classes: int = 3
    in_channels: int = 256
    cls_channels: Sequence[int] = (256, 256)
    reg_channels: Sequence[int] = (256, 256)
    enlarge_width: float = 0.1
    # test cfg
    nms_pre: int = 512
    score_thr: float = 0.0
    nms_iou_thr: float = 0.8
    max_num: int = 128

    @nn.compact
    def __call__(self, feat_dict, train: bool = False):
        """→ (bbox_preds [B,S,8], cls_preds [B,S,K])."""
        x = feat_dict['fp_features']
        c = x
        for i, ch in enumerate(self.cls_channels):
            c = nn.Dense(ch, use_bias=False, name=f'cls_fc{i}')(c)
            c = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f'cls_bn{i}')(c)
            c = nn.relu(c)
        cls_preds = nn.Dense(self.num_classes, name='cls_out')(c)
        r = x
        for i, ch in enumerate(self.reg_channels):
            r = nn.Dense(ch, use_bias=False, name=f'reg_fc{i}')(r)
            r = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f'reg_bn{i}')(r)
            r = nn.relu(r)
        bbox_preds = nn.Dense(8, name='reg_out')(r)
        return bbox_preds, cls_preds

    # -------------------------------------------------------------- targets

    def _point_targets(self, xyz, pmask, gtb, gtl, gtm):
        """Per-point fg/ignore + matched GT box (ONE sample)."""
        _, inside = points_in_boxes_local(xyz, gtb[:, :7])
        inside = inside & gtm[None]
        enlarged = gtb[:, :7].at[:, 3:6].add(2 * self.enlarge_width)
        _, inside_enl = points_in_boxes_local(xyz, enlarged)
        inside_enl = inside_enl & gtm[None]
        fg = jnp.any(inside, -1) & pmask
        ignore = jnp.any(inside_enl, -1) & ~fg & pmask
        gi = jnp.argmax(inside, -1)
        return fg, ignore, gi

    def loss_by_feat(self, preds, feat_dict, gt_bboxes, gt_labels, gt_mask):
        bbox_preds, cls_preds = preds
        xyz = feat_dict['fp_xyz']
        pmask = feat_dict['fp_mask']

        def one(bp, cp, x, pm, gtb, gtl, gtm):
            fg, ignore, gi = self._point_targets(x, pm, gtb, gtl, gtm)
            g = gtb[gi]
            labels = jnp.where(fg, gtl[gi], self.num_classes)
            onehot = jax.nn.one_hot(labels, self.num_classes)
            w = (pm & ~ignore).astype(jnp.float32)
            npos = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
            l_cls = jnp.sum(sigmoid_focal_loss(cp, onehot)
                            * w[:, None]) / npos
            tgt = jnp.concatenate([
                g[:, :3] - x,
                jnp.log(jnp.maximum(g[:, 3:6], 1e-4)),
                jnp.cos(g[:, 6:7]), jnp.sin(g[:, 6:7])], -1)
            l_reg = jnp.sum(smooth_l1_loss(bp, tgt)
                            * fg[:, None]) / npos
            return l_cls, l_reg

        l_cls, l_reg = jax.vmap(one)(bbox_preds, cls_preds, xyz, pmask,
                                     gt_bboxes, gt_labels, gt_mask)
        return dict(rpn_loss_cls=jnp.mean(l_cls),
                    rpn_loss_bbox=jnp.mean(l_reg))

    # -------------------------------------------------------------- predict

    def decode(self, bbox_preds, xyz):
        """Per-point box decode (ref PointXYZWHLRBBoxCoder)."""
        center = xyz + bbox_preds[..., :3]
        dims = jnp.exp(jnp.clip(bbox_preds[..., 3:6], -4, 4))
        yaw = jnp.arctan2(bbox_preds[..., 7:8], bbox_preds[..., 6:7])
        return jnp.concatenate([center, dims, yaw], -1)

    def predict_by_feat(self, preds, feat_dict):
        bbox_preds, cls_preds = preds
        xyz = feat_dict['fp_xyz']
        pmask = feat_dict['fp_mask']
        boxes = self.decode(bbox_preds, xyz)

        def one(bx, cp, pm):
            scores = jax.nn.sigmoid(cp) * pm[:, None]
            top_v, top_i = jax.lax.top_k(
                jnp.max(scores, -1), min(self.nms_pre, bx.shape[0]))
            b = bx[top_i]
            sc = scores[top_i]
            bev = b[:, [0, 1, 3, 4, 6]]
            res = box3d_multiclass_nms(
                b, bev, sc, self.score_thr, self.nms_iou_thr,
                self.max_num, use_rotate_nms=True)
            return dict(bboxes=res['bboxes'], scores=res['scores'],
                        labels=res['labels'], mask=res['mask'])

        return jax.vmap(one)(boxes, cls_preds, pmask)
