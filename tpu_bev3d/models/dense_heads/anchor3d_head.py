"""Anchor-based 3D head (SECOND / PointPillars).

Ref: mmdet3d/models/dense_heads/anchor3d_head.py:23-428 (conv_cls/conv_reg/
conv_dir 1x1 heads, sin-difference rotation encoding add_sin_difference:333,
per-class assignment via train_mixins.anchor_target_3d) and
base_3d_dense_head.py predict_by_feat:186.

TPU design: anchors are generated host-side per (static) featmap shape and
closed over as constants; assignment/losses are fixed-shape over padded GT
tables; prediction emits fixed-size [max_num] detections + validity mask.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS, TASK_UTILS
from ..losses.losses import (sigmoid_focal_loss, smooth_l1_loss,
                             softmax_cross_entropy)
from ..task_modules.assigners import max_iou_assign
from ..task_modules.coders import DeltaXYZWLHRBBoxCoder
from ...ops.nms import box3d_multiclass_nms


def limit_period(val, offset=0.5, period=np.pi):
    return val - jnp.floor(val / period + offset) * period


@MODELS.register_module()
class Anchor3DHead(nn.Module):
    """Config surface mirrors the reference's (anchor3d_head.py:23-100)."""
    num_classes: int = 3
    in_channels: int = 384
    feat_channels: int = 384
    use_direction_classifier: bool = True
    anchor_generator: Optional[dict] = None
    assigner_cfgs: Optional[Sequence[dict]] = None  # per-class thresholds
    diff_rad_by_sin: bool = True
    dir_offset: float = -np.pi / 2
    dir_limit_offset: float = 0.0
    box_code_size: int = 7
    # loss hyperparams (ref config: FocalLoss g2 a0.25 w1, SmoothL1 b=1/9 w2,
    # dir CE w0.2)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    smooth_l1_beta: float = 1.0 / 9.0
    loss_bbox_weight: float = 2.0
    loss_dir_weight: float = 0.2
    # test cfg
    nms_pre: int = 1024
    score_thr: float = 0.1
    nms_iou_thr: float = 0.01
    max_num: int = 50
    use_rotate_nms: bool = True

    def setup(self):
        gen_cfg = dict(self.anchor_generator or {})
        self._gen = TASK_UTILS.build({**gen_cfg,
                                      'reshape_out': False})
        self._coder = DeltaXYZWLHRBBoxCoder(self.box_code_size)
        self._num_anchors = self._gen.num_base_anchors
        self.conv_cls = nn.Conv(self._num_anchors * self.num_classes, (1, 1))
        self.conv_reg = nn.Conv(self._num_anchors * self.box_code_size, (1, 1))
        if self.use_direction_classifier:
            self.conv_dir = nn.Conv(self._num_anchors * 2, (1, 1))

    def __call__(self, x, train: bool = False):
        """x [B, H, W, C] → (cls [B,H,W,A*K], reg [B,H,W,A*7], dir)."""
        cls_score = self.conv_cls(x)
        bbox_pred = self.conv_reg(x)
        dir_pred = self.conv_dir(x) if self.use_direction_classifier else None
        return cls_score, bbox_pred, dir_pred

    # ---------------- target assignment + loss (pure fns of outputs) -------

    def _anchors(self, featmap_size):
        """[A_total, 7] anchors + [A_total] per-anchor class (host numpy,
        closed over as a constant under jit)."""
        anc = self._gen.grid_anchors(featmap_size)      # [H, W, A, 7]
        H, W, A, _ = anc.shape
        anc = anc.reshape(-1, 7)
        if self.box_code_size > 7:
            # velocity anchors are zero (ref anchor coder with code_size 9)
            anc = np.concatenate(
                [anc, np.zeros((anc.shape[0], self.box_code_size - 7),
                               np.float32)], -1)
        cls = np.tile(self._gen.anchor_classes(self.num_classes), H * W)
        return jnp.asarray(anc), jnp.asarray(cls)

    def loss_by_feat(self, outs, gt_bboxes, gt_labels, gt_mask):
        """Args:
          outs: head outputs for ONE level (cls, reg, dir) NHWC.
          gt_bboxes [B, G, 7]; gt_labels [B, G]; gt_mask [B, G] bool.
        Returns dict(loss_cls, loss_bbox, loss_dir).
        """
        cls_score, bbox_pred, dir_pred = outs
        B, H, W, _ = cls_score.shape
        anchors, anchor_cls = self._anchors((H, W))
        A = anchors.shape[0]
        cls_score = cls_score.reshape(B, A, self.num_classes)
        bbox_pred = bbox_pred.reshape(B, A, self.box_code_size)
        if dir_pred is not None:
            dir_pred = dir_pred.reshape(B, A, 2)
        class_agnostic = len(self._gen.sizes) != self.num_classes
        return self.loss_from_flat(cls_score, bbox_pred, dir_pred, anchors,
                                   anchor_cls, class_agnostic,
                                   gt_bboxes, gt_labels, gt_mask)

    def loss_from_flat(self, cls_score, bbox_pred, dir_pred, anchors,
                       anchor_cls, class_agnostic, gt_bboxes, gt_labels,
                       gt_mask):
        """Anchor loss over FLAT per-anchor predictions [B, A, ·] —
        shared by Anchor3DHead (NHWC maps) and ShapeAwareHead
        (concatenated per-task flats)."""
        B, A = cls_score.shape[:2]
        assigner_cfgs = self.assigner_cfgs or [dict(
            pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45)] \
            * self.num_classes

        def one_sample(cls_s, box_p, dir_p, gtb, gtl, gtm):
            if class_agnostic:
                acfg = assigner_cfgs[0]
                res = max_iou_assign(
                    anchors, gtb, gtl, gtm,
                    pos_iou_thr=acfg['pos_iou_thr'],
                    neg_iou_thr=acfg['neg_iou_thr'],
                    min_pos_iou=acfg.get('min_pos_iou', 0.0))
                gt_inds, max_ol = res.gt_inds, res.max_overlaps
            else:
                # per-class assignment: class c anchors vs class c GTs (ref
                # train_mixins.anchor_target_3d assign_per_class path)
                gt_inds = jnp.zeros(A, jnp.int32)
                max_ol = jnp.full(A, -1.0)
                for c, acfg in enumerate(assigner_cfgs):
                    amask = (anchor_cls[:, None] == c) & (gtl[None, :] == c)
                    res = max_iou_assign(
                        anchors, gtb, gtl, gtm,
                        pos_iou_thr=acfg['pos_iou_thr'],
                        neg_iou_thr=acfg['neg_iou_thr'],
                        min_pos_iou=acfg.get('min_pos_iou', 0.0),
                        anchor_mask=amask)
                    sel = anchor_cls == c
                    gt_inds = jnp.where(sel, res.gt_inds, gt_inds)
                    max_ol = jnp.where(sel, res.max_overlaps, max_ol)
            pos = gt_inds > 0
            neg = gt_inds == 0
            agt = jnp.clip(gt_inds - 1, 0)
            labels = jnp.where(pos, gtl[agt], self.num_classes)
            # cls: focal over pos+neg (ignore zone weight 0)
            onehot = jax.nn.one_hot(labels, self.num_classes,
                                    dtype=cls_s.dtype)
            cls_w = (pos | neg).astype(cls_s.dtype)
            num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
            l_cls = jnp.sum(
                sigmoid_focal_loss(cls_s, onehot, self.focal_gamma,
                                   self.focal_alpha) * cls_w[:, None]) \
                / num_pos
            # bbox: smooth-l1 on deltas with sin-diff rotation
            tgt = self._coder.encode(gtb[agt], anchors)
            pred = box_p
            if self.diff_rad_by_sin:
                # sin(a-b) = sin a cos b - cos a sin b (ref :333-352)
                pr, tr = pred[:, 6:7], tgt[:, 6:7]
                pred = jnp.concatenate(
                    [pred[:, :6], jnp.sin(pr) * jnp.cos(tr), pred[:, 7:]], -1)
                tgt = jnp.concatenate(
                    [tgt[:, :6], jnp.cos(pr) * jnp.sin(tr), tgt[:, 7:]], -1)
            l_bbox = jnp.sum(
                smooth_l1_loss(pred, tgt, self.smooth_l1_beta)
                * pos[:, None].astype(pred.dtype)) / num_pos
            out = dict(loss_cls=self.loss_cls_weight * l_cls,
                       loss_bbox=self.loss_bbox_weight * l_bbox)
            if dir_p is not None:
                rot_gt = gtb[agt][:, 6]
                offset_rot = limit_period(rot_gt - self.dir_offset, 0,
                                          2 * np.pi)
                dir_tgt = jnp.clip(jnp.floor(offset_rot / np.pi), 0,
                                   1).astype(jnp.int32)
                l_dir = jnp.sum(
                    softmax_cross_entropy(dir_p, dir_tgt)
                    * pos.astype(dir_p.dtype)) / num_pos
                out['loss_dir'] = self.loss_dir_weight * l_dir
            return out

        per_sample = jax.vmap(one_sample)(
            cls_score, bbox_pred,
            dir_pred if dir_pred is not None else jnp.zeros((B, A, 2)),
            gt_bboxes, gt_labels, gt_mask)
        return {k: jnp.mean(v) for k, v in per_sample.items()}

    # ---------------- prediction -------------------------------------------

    def predict_by_feat(self, outs):
        """→ dict(bboxes [B,max_num,7], scores, labels, mask) fixed-shape.
        Ref: Base3DDenseHead.predict_by_feat:186 + box3d_multiclass_nms."""
        cls_score, bbox_pred, dir_pred = outs
        B, H, W, _ = cls_score.shape
        anchors, _ = self._anchors((H, W))
        A = anchors.shape[0]
        cls_score = cls_score.reshape(B, A, self.num_classes)
        bbox_pred = bbox_pred.reshape(B, A, self.box_code_size)
        dir_score = (jnp.argmax(dir_pred.reshape(B, A, 2), -1)
                     if dir_pred is not None else jnp.zeros((B, A), jnp.int32))

        def one(cls_s, box_p, dir_s):
            scores = jax.nn.sigmoid(cls_s)                  # [A, K]
            top_v, top_i = jax.lax.top_k(jnp.max(scores, -1),
                                         min(self.nms_pre, A))
            anc = anchors[top_i]
            boxes = self._coder.decode(anc, box_p[top_i])
            sc = scores[top_i]
            ds = dir_s[top_i]
            bev = boxes[:, [0, 1, 3, 4, 6]]
            res = box3d_multiclass_nms(
                boxes, bev, sc, self.score_thr, self.nms_iou_thr,
                self.max_num, mlvl_dir_scores=ds,
                use_rotate_nms=self.use_rotate_nms)
            # dir correction (ref base_3d_dense_head.py:318-325)
            yaw = res['bboxes'][:, 6]
            lim = limit_period(yaw - self.dir_offset, self.dir_limit_offset,
                               np.pi)
            yaw = lim + self.dir_offset \
                + np.pi * res['dir_scores'].astype(yaw.dtype)
            bboxes = res['bboxes'].at[:, 6].set(yaw)
            return dict(bboxes=bboxes, scores=res['scores'],
                        labels=res['labels'], mask=res['mask'])

        return jax.vmap(one)(cls_score, bbox_pred, dir_score)
