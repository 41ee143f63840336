"""FreeAnchor3D head: learning-to-match anchor assignment.

Ref: mmdet3d/models/dense_heads/free_anchor3d_head.py:17-296 — instead of
IoU thresholds, each GT owns a bag of top-k anchors; training maximizes a
mean-max of the bag's joint cls x box likelihood (positive term) and
applies a focal negative term on cls_prob * (1 - P{anchor in A+}).
Same forward/decode as Anchor3DHead.

TPU design: fixed-shape padded GT tables with validity masks; the sparse
per-class max (ref :146-172, sparse_coo_tensor dance) becomes a static
loop over classes with masked maxes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from typing import Optional, Sequence

from ...ops.iou3d import nearest_iou_bev
from ...registry import MODELS
from ..losses.losses import smooth_l1_loss, softmax_cross_entropy
from .anchor3d_head import Anchor3DHead, limit_period


@MODELS.register_module()
class FreeAnchor3DHead(Anchor3DHead):
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5
    code_weight: Optional[Sequence[float]] = None

    def loss_by_feat(self, outs, gt_bboxes, gt_labels, gt_mask):
        cls_score, bbox_pred, dir_pred = outs
        B, H, W, _ = cls_score.shape
        anchors, _ = self._anchors((H, W))
        A = anchors.shape[0]
        K = self.num_classes
        cls_score = cls_score.reshape(B, A, K)
        bbox_pred = bbox_pred.reshape(B, A, self.box_code_size)
        dir_cls = (dir_pred.reshape(B, A, 2) if dir_pred is not None
                   else None)
        topk = min(self.pre_anchor_topk, A)
        use_dir = dir_cls is not None

        def one(cls_s, box_p, dir_p, gtb, gtl, gtm):
            probs = jax.nn.sigmoid(cls_s)                    # [A, K]
            gtl_c = jnp.clip(gtl, 0)
            # ---- P{a_j in A+} (no grad; ref :127-173) ----
            decoded = jax.lax.stop_gradient(
                self._coder.decode(anchors, box_p))
            iou_ga = nearest_iou_bev(gtb[:, :7], decoded[:, :7])   # [G, A]
            iou_ga = iou_ga * gtm[:, None]
            t1 = self.bbox_thr
            t2 = jnp.clip(jnp.max(iou_ga, -1, keepdims=True),
                          t1 + 1e-6, None)
            object_box_prob = jnp.clip((iou_ga - t1) / (t2 - t1), 0, 1)
            object_box_prob = object_box_prob * gtm[:, None]
            # image_box_prob[j, c] = max over GTs of class c (ref sparse max)
            cls_sel = (jax.nn.one_hot(gtl_c, K) * gtm[:, None])    # [G, K]
            image_box_prob = jnp.max(
                object_box_prob[:, :, None] * cls_sel[:, None, :],
                axis=0)                                            # [A, K]
            # ---- anchor bags: top-k anchors by IoU(gt, anchor) ----
            mqm = nearest_iou_bev(gtb[:, :7], anchors[:, :7])      # [G, A]
            _, matched = jax.lax.top_k(mqm, topk)                  # [G, k]
            matched_cls_prob = probs[matched, gtl_c[:, None]]      # [G, k]
            matched_anchors = anchors[matched]                     # [G,k,code]
            tgt = self._coder.encode(
                jnp.broadcast_to(gtb[:, None, :], matched_anchors.shape),
                matched_anchors)                                   # [G,k,code]
            # direction likelihood folded into the box loss (ref :199-231)
            loss_dir = 0.0
            if use_dir:
                rot = matched_anchors[..., 6] + tgt[..., 6]
                offset_rot = limit_period(rot - self.dir_offset, 0,
                                          2 * np.pi)
                dir_tgt = jnp.clip(jnp.floor(offset_rot / np.pi), 0,
                                   1).astype(jnp.int32)
                loss_dir = self.loss_dir_weight * softmax_cross_entropy(
                    dir_p[matched], dir_tgt)                       # [G, k]
            pred = box_p[matched]
            if self.diff_rad_by_sin:
                pr, tr = pred[..., 6:7], tgt[..., 6:7]
                pred = jnp.concatenate(
                    [pred[..., :6], jnp.sin(pr) * jnp.cos(tr),
                     pred[..., 7:]], -1)
                tgt = jnp.concatenate(
                    [tgt[..., :6], jnp.cos(pr) * jnp.sin(tr),
                     tgt[..., 7:]], -1)
            lb = smooth_l1_loss(pred, tgt, self.smooth_l1_beta)
            if self.code_weight is not None:
                lb = lb * jnp.asarray(self.code_weight, lb.dtype)
            loss_bbox = self.loss_bbox_weight * jnp.sum(lb, -1) + loss_dir
            matched_box_prob = jnp.exp(-loss_bbox)                 # [G, k]
            # ---- positive bag loss (ref positive_bag_loss:255-280) ----
            matched_prob = matched_cls_prob * matched_box_prob
            w = 1.0 / jnp.clip(1.0 - matched_prob, 1e-12, None)
            w = w / jnp.sum(w, -1, keepdims=True)
            bag_prob = jnp.clip(jnp.sum(w * matched_prob, -1), 0, 1)
            pos = self.alpha * (-jnp.log(jnp.clip(bag_prob, 1e-12)))
            pos_sum = jnp.sum(pos * gtm)
            # ---- negative bag loss (ref negative_bag_loss:282-296) ----
            prob = jnp.clip(probs * (1.0 - image_box_prob), 0, 1)
            neg = (1 - self.alpha) * prob ** self.gamma \
                * (-jnp.log(jnp.clip(1.0 - prob, 1e-12)))
            return pos_sum, jnp.sum(neg), jnp.sum(gtm)

        pos_sum, neg_sum, npos = jax.vmap(one)(
            cls_score, bbox_pred,
            dir_cls if dir_cls is not None else jnp.zeros((B, A, 2)),
            gt_bboxes, gt_labels, gt_mask)
        total_pos = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(
            positive_bag_loss=jnp.sum(pos_sum) / total_pos,
            negative_bag_loss=jnp.sum(neg_sum)
            / jnp.maximum(total_pos * self.pre_anchor_topk, 1.0))
