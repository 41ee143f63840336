"""PointRCNN RoI head — canonical point pooling + PointNet refinement.

Ref: mmdet3d/models/roi_heads/point_rcnn_roi_head.py +
bbox_heads/point_rcnn_bbox_head.py — pool the points (xyz + features)
inside each (enlarged) proposal, transform to the canonical box frame,
encode with a shared PointNet, and regress an IoU-guided score + box
residual.

TPU design: fixed K point slots per RoI selected by a top-k over the
inside mask (earlier points win ties) — all gathers fixed-shape.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.iou3d import nearest_iou_bev
from ...registry import MODELS
from ..losses.losses import (binary_cross_entropy_with_logits,
                             smooth_l1_loss)
from .part_aggregation_roi_head import points_in_boxes_local


def pool_roi_points(xyz, feats, pmask, rois, K: int, enlarge: float = 0.5):
    """→ (local_xyz [R,K,3], feats [R,K,C], valid [R,K]) for ONE sample."""
    enlarged = rois.at[:, 3:6].add(2 * enlarge)
    _, inside = points_in_boxes_local(xyz, enlarged)       # [P, R]
    inside = inside & pmask[:, None]
    P = xyz.shape[0]
    # deterministic selection: prefer earlier indices among inside points
    prio = inside.astype(jnp.float32).T * (2.0 - jnp.arange(P) / P)[None]
    _, idx = jax.lax.top_k(prio, K)                        # [R, K]
    valid = jnp.take_along_axis(inside.T, idx, 1)          # [R, K]
    pts = xyz[idx]                                         # [R, K, 3]
    f = feats[idx]
    # canonical transform (ref point_rcnn_bbox_head canonical_transform)
    d = pts - rois[:, None, :3]
    c, s = jnp.cos(-rois[:, 6]), jnp.sin(-rois[:, 6])
    lx = d[..., 0] * c[:, None] - d[..., 1] * s[:, None]
    ly = d[..., 0] * s[:, None] + d[..., 1] * c[:, None]
    local = jnp.stack([lx, ly, d[..., 2]], -1)
    return local, f, valid


@MODELS.register_module()
class PointRCNNRoIHead(nn.Module):
    in_channels: int = 256
    num_points: int = 64
    mlp_channels: Sequence[int] = (128, 128)
    fc_channels: Sequence[int] = (256, 256)
    pos_iou_thr: float = 0.55
    cls_pos_thr: float = 0.7
    cls_neg_thr: float = 0.25

    @nn.compact
    def __call__(self, feat_dict, proposals, train: bool = False):
        boxes = proposals['bboxes'][..., :7]
        B, R = boxes.shape[:2]
        K = self.num_points

        local, f, valid = jax.vmap(
            lambda x, ft, pm, ro: pool_roi_points(x, ft, pm, ro, K))(
                feat_dict['fp_xyz'], feat_dict['fp_features'],
                feat_dict['fp_mask'], boxes)               # [B,R,K,·]
        x = jnp.concatenate([local, f], -1)
        for i, ch in enumerate(self.mlp_channels):
            x = nn.Dense(ch, name=f'mlp{i}')(x)
            x = nn.relu(x)
        x = x * valid[..., None]
        x = jnp.max(jnp.where(valid[..., None], x, -jnp.inf), axis=2)
        x = jnp.where(jnp.isfinite(x), x, 0.0)             # [B,R,C]
        for i, ch in enumerate(self.fc_channels):
            x = nn.Dense(ch, name=f'fc{i}')(x)
            x = nn.relu(x)
        cls_logit = nn.Dense(1, name='cls')(x)[..., 0]
        delta = nn.Dense(7, name='reg')(x)

        diag = jnp.sqrt(boxes[..., 3] ** 2 + boxes[..., 4] ** 2)
        refined = jnp.concatenate([
            boxes[..., :2] + delta[..., :2] * diag[..., None],
            boxes[..., 2:3] + delta[..., 2:3] * boxes[..., 5:6],
            boxes[..., 3:6] * jnp.exp(jnp.clip(delta[..., 3:6], -2, 2)),
            boxes[..., 6:7] + delta[..., 6:7],
        ], -1)
        score = jax.nn.sigmoid(cls_logit) * proposals['scores']
        return dict(bboxes=refined, scores=score,
                    labels=proposals['labels'], mask=proposals['mask'],
                    _delta=delta, _cls_logit=cls_logit, _proposals=boxes)

    def loss(self, out, gt_bboxes, gt_labels, gt_mask):
        def one(prop, delta, cls_logit, pmask, gtb, gtm):
            iou = nearest_iou_bev(prop, gtb[:, :7])
            iou = jnp.where(gtm[None] & pmask[:, None], iou, -1.0)
            best = jnp.argmax(iou, -1)
            best_iou = jnp.max(iou, -1)
            pos = best_iou > self.pos_iou_thr
            g = gtb[best]
            diag = jnp.sqrt(prop[:, 3] ** 2 + prop[:, 4] ** 2)
            tgt = jnp.concatenate([
                (g[:, :2] - prop[:, :2]) / diag[:, None],
                (g[:, 2:3] - prop[:, 2:3])
                / jnp.maximum(prop[:, 5:6], 1e-3),
                jnp.log(jnp.maximum(g[:, 3:6], 1e-3)
                        / jnp.maximum(prop[:, 3:6], 1e-3)),
                jnp.sin(g[:, 6:7] - prop[:, 6:7]),
            ], -1)
            pred = jnp.concatenate(
                [delta[:, :6], jnp.sin(delta[:, 6:7])], -1)
            npos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
            l_reg = jnp.sum(smooth_l1_loss(pred, tgt)
                            * pos[:, None]) / npos
            tgt_cls = jnp.clip(
                (best_iou - self.cls_neg_thr)
                / (self.cls_pos_thr - self.cls_neg_thr), 0, 1)
            l_cls = jnp.sum(binary_cross_entropy_with_logits(
                cls_logit, tgt_cls) * pmask) \
                / jnp.maximum(jnp.sum(pmask), 1.0)
            return l_reg, l_cls

        l_reg, l_cls = jax.vmap(one)(
            out['_proposals'], out['_delta'], out['_cls_logit'],
            out['mask'], gt_bboxes, gt_mask)
        return dict(loss_rcnn_reg=jnp.mean(l_reg),
                    loss_rcnn_cls=jnp.mean(l_cls))
