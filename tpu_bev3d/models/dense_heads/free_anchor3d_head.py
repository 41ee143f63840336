"""FreeAnchor3D head: learning-to-match anchor assignment.

Ref: mmdet3d/models/dense_heads/free_anchor3d_head.py — instead of IoU
thresholds, each GT owns a bag of top-k anchors; training maximizes the
bag's best (cls × loc) likelihood (positive term) and suppresses
background anchors weighted by their object-free probability (negative
focal term). Same forward/decode as Anchor3DHead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.iou3d import nearest_iou_bev
from ...registry import MODELS
from .anchor3d_head import Anchor3DHead


@MODELS.register_module()
class FreeAnchor3DHead(Anchor3DHead):
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5

    def loss_by_feat(self, outs, gt_bboxes, gt_labels, gt_mask):
        cls_score, bbox_pred, dir_pred = outs
        B, H, W, _ = cls_score.shape
        anchors, _ = self._anchors((H, W))
        A = anchors.shape[0]
        K = self.num_classes
        cls_score = cls_score.reshape(B, A, K)
        bbox_pred = bbox_pred.reshape(B, A, self.box_code_size)

        def one(cls_s, box_p, gtb, gtl, gtm):
            probs = jax.nn.sigmoid(cls_s)                 # [A, K]
            decoded = self._coder.decode(anchors, box_p)  # [A, code]
            # anchor bags: top-k anchors by IoU with each GT
            iou_ag = nearest_iou_bev(anchors[:, :7], gtb[:, :7])  # [A, G]
            iou_ag = jnp.where(gtm[None], iou_ag, -1.0)
            topk = min(self.pre_anchor_topk, A)
            bag_iou, bag_idx = jax.lax.top_k(iou_ag.T, topk)      # [G, k]
            # localization likelihood: IoU(decoded anchor, gt) saturated
            iou_dg = nearest_iou_bev(decoded[:, :7], gtb[:, :7])  # [A, G]
            loc_p = jnp.clip(
                (jnp.take_along_axis(iou_dg, bag_idx.T, 0).T
                 - self.bbox_thr) / (1 - self.bbox_thr), 0, 1)    # [G, k]
            cls_p = probs[bag_idx, jnp.clip(gtl, 0)[:, None]]      # [G, k]
            joint = cls_p * loc_p
            # soft-max matching weight inside the bag (ref :positive_bag_loss)
            w = jax.nn.softmax(joint * 10.0, axis=-1)
            bag_ll = jnp.sum(w * joint, -1)                        # [G]
            npos = jnp.maximum(jnp.sum(gtm.astype(jnp.float32)), 1.0)
            pos_loss = -jnp.sum(
                jnp.log(jnp.clip(bag_ll, 1e-6)) * gtm) / npos
            # negative term: P(bg) weighted focal on all anchors; anchors
            # matched to some GT (by IoU of their decode) are discounted
            best_iou = jnp.max(jnp.where(gtm[None], iou_dg, 0.0), -1)
            obj_free = 1.0 - jnp.clip(
                (best_iou - self.bbox_thr) / (1 - self.bbox_thr), 0, 1)
            neg = (probs ** self.gamma) * (-jnp.log(
                jnp.clip(1 - probs, 1e-6)))
            neg_loss = jnp.sum(neg * obj_free[:, None]) \
                / jnp.maximum(npos * self.pre_anchor_topk, 1.0)
            return (self.alpha * pos_loss,
                    (1 - self.alpha) * neg_loss)

        pos, negl = jax.vmap(one)(cls_score, bbox_pred, gt_bboxes,
                                  gt_labels, gt_mask)
        return dict(positive_bag_loss=jnp.mean(pos),
                    negative_bag_loss=jnp.mean(negl))
