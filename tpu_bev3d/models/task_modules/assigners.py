"""Anchor–GT assignment (pure jnp, fixed-shape).

Ref: mmdet3d Max3DIoUAssigner (models/task_modules/assigners/
max_3d_iou_assigner.py) with BboxOverlapsNearest3D (aligned BEV IoU of the
yaw-rounded box — structures/ops/iou3d_calculator.py). GTs arrive padded to
a static max count with a validity mask; the result is fixed-shape per
anchor.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...ops.iou3d import nearest_iou_bev


class AssignResult(NamedTuple):
    gt_inds: jnp.ndarray     # [A] int32: -1 ignore, 0 negative, >0 = gt idx+1
    max_overlaps: jnp.ndarray  # [A] float
    labels: jnp.ndarray      # [A] assigned gt label or -1


def max_iou_assign(anchors, gt_bboxes, gt_labels, gt_mask,
                   pos_iou_thr: float, neg_iou_thr: float,
                   min_pos_iou: float = 0.0,
                   match_low_quality: bool = True,
                   anchor_mask=None) -> AssignResult:
    """Max-IoU assignment over BEV nearest (axis-aligned) IoU.

    Args:
      anchors: [A, 7] boxes; gt_bboxes [G, 7]; gt_labels [G]; gt_mask [G].
      anchor_mask: optional [A, G] bool — pairs allowed to match (used for
        per-class assignment).
    """
    iou = nearest_iou_bev(anchors[:, :7], gt_bboxes[:, :7])  # [A, G]
    valid = gt_mask[None, :]
    if anchor_mask is not None:
        valid = valid & anchor_mask
    iou = jnp.where(valid, iou, -1.0)

    max_overlaps = jnp.max(iou, axis=1)
    argmax = jnp.argmax(iou, axis=1)

    gt_inds = jnp.zeros(anchors.shape[0], jnp.int32)          # 0 = negative
    gt_inds = jnp.where(max_overlaps >= pos_iou_thr,
                        argmax.astype(jnp.int32) + 1, gt_inds)
    # ignore zone between neg and pos thresholds
    gt_inds = jnp.where((max_overlaps >= neg_iou_thr)
                        & (max_overlaps < pos_iou_thr), -1, gt_inds)

    if match_low_quality:
        # each GT claims its best anchor (ref max_3d_iou_assigner low-quality
        # matching): anchor a is force-assigned to gt g if iou[a,g] equals
        # gt_max[g] and gt_max[g] >= min_pos_iou.
        gt_max = jnp.max(iou, axis=0)                         # [G]
        is_best = (iou == gt_max[None, :]) & (gt_max[None, :] >= min_pos_iou) \
            & valid
        any_best = jnp.any(is_best, axis=1)
        best_gt = jnp.argmax(is_best, axis=1).astype(jnp.int32)
        gt_inds = jnp.where(any_best, best_gt + 1, gt_inds)

    pos = gt_inds > 0
    assigned_gt = jnp.clip(gt_inds - 1, 0)
    labels = jnp.where(pos, gt_labels[assigned_gt], -1)
    return AssignResult(gt_inds, max_overlaps, labels)
