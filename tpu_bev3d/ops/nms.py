"""3D / BEV NMS on TPU: fixed-shape greedy suppression scans.

Replaces mmcv CUDA ``nms``/``nms_rotated``/``nms3d`` and the numba
``circle_nms`` used by ref mmdet3d/models/layers/box3d_nms.py:11-295.

TPU design: boxes are padded to a static ``N`` (pre-NMS top-k keeps N ≤ ~1k
in every reference config). We precompute the [N, N] suppression matrix in
one shot (rotated IoU or center distance — both vectorized) and run an O(N)
``lax.fori_loop`` greedy scan over score-sorted boxes. The result is a keep
mask, not a gathered index list — callers stay fixed-shape and mask instead
of slicing (the XLA way; ref returns dynamic index tensors).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .iou3d import aligned_iou_bev, rotated_iou_bev


def _greedy_scan(suppress, valid):
    """Greedy NMS over score-descending boxes given a pairwise suppression
    matrix. suppress[i, j]=True means higher-ranked i (if kept) kills j.

    On TPU backends the scan runs as a Pallas kernel with the matrix
    resident in VMEM (ops/pallas_nms.py) — the XLA fori_loop issues N
    sequential HBM reads instead."""
    from .pallas_nms import greedy_scan_pallas, use_pallas
    if use_pallas():
        return greedy_scan_pallas(suppress, valid)
    N = suppress.shape[0]
    idx = jnp.arange(N)

    def body(i, keep):
        killed = jnp.any(keep & suppress[:, i] & (idx < i))
        return keep.at[i].set(keep[i] & ~killed)

    return jax.lax.fori_loop(0, N, body, valid)


def nms_bev_mask(boxes_xywhr, scores, valid, iou_thr):
    """Rotated BEV NMS (ref nms_bev, box3d_nms.py:234-278).

    Args: boxes [N,5] (x,y,dx,dy,r), scores [N], valid [N] bool.
    Returns keep mask [N] over the ORIGINAL order.
    """
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes_xywhr[order]
    v = valid[order]
    iou = rotated_iou_bev(b, b)
    keep_sorted = _greedy_scan(iou > iou_thr, v)
    keep = jnp.zeros_like(valid).at[order].set(keep_sorted)
    return keep


def nms_normal_bev_mask(boxes_xywhr, scores, valid, iou_thr):
    """Axis-aligned BEV NMS ignoring rotation (ref nms_normal_bev,
    box3d_nms.py:281-295)."""
    half = boxes_xywhr[:, 2:4] * 0.5
    xyxy = jnp.concatenate(
        [boxes_xywhr[:, :2] - half, boxes_xywhr[:, :2] + half], -1)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = xyxy[order]
    v = valid[order]
    iou = aligned_iou_bev(b, b)
    keep_sorted = _greedy_scan(iou > iou_thr, v)
    return jnp.zeros_like(valid).at[order].set(keep_sorted)


def circle_nms_mask(centers, scores, valid, radius):
    """Distance-based NMS (CenterPoint; ref numba circle_nms,
    box3d_nms.py:186-231). Suppress j if dist²(i, j) < radius² (the reference
    compares squared distance to ``min_radius`` directly)."""
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    c = centers[order]
    v = valid[order]
    d2 = jnp.sum((c[:, None, :] - c[None, :, :]) ** 2, -1)
    keep_sorted = _greedy_scan(d2 < radius, v)
    return jnp.zeros_like(valid).at[order].set(keep_sorted)


def aligned_3d_nms_mask(boxes, scores, classes, valid, iou_thr):
    """Axis-aligned 3D NMS for indoor heads (ref aligned_3d_nms,
    box3d_nms.py:134-183). boxes [N,6] (x1,y1,z1,x2,y2,z2); class-aware."""
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    cls = classes[order]
    v = valid[order]
    lt = jnp.maximum(b[:, None, :3], b[None, :, :3])
    rb = jnp.minimum(b[:, None, 3:6], b[None, :, 3:6])
    whd = jnp.maximum(rb - lt, 0.0)
    inter = whd.prod(-1)
    vol = jnp.maximum((b[:, 3:6] - b[:, :3]).prod(-1), 1e-8)
    iou = inter / jnp.maximum(vol[:, None] + vol[None, :] - inter, 1e-8)
    same = cls[:, None] == cls[None, :]
    keep_sorted = _greedy_scan((iou > iou_thr) & same, v)
    return jnp.zeros_like(valid).at[order].set(keep_sorted)


@partial(jax.jit, static_argnames=('max_out', 'use_rotate_nms'))
def box3d_multiclass_nms(mlvl_bboxes, mlvl_bboxes_for_nms, mlvl_scores,
                         score_thr, iou_thr, max_out: int,
                         mlvl_dir_scores=None, mlvl_attr_scores=None,
                         use_rotate_nms: bool = True):
    """Multi-class NMS, class-wise then global top-k.

    Functional analogue of ref box3d_multiclass_nms (box3d_nms.py:11-131):
    per class: threshold scores, NMS, collect; concat; cap at max_out.
    Here the output is fixed-shape [max_out] with a validity mask.

    Args:
      mlvl_bboxes:        [N, box_dim] decoded boxes.
      mlvl_bboxes_for_nms:[N, 5] BEV xywhr.
      mlvl_scores:        [N, num_classes] (NO background column — unlike the
                          reference we never append one).
    Returns dict(bboxes [max_out, box_dim], scores, labels, dir_scores,
                 attr_scores, mask).
    """
    N, num_classes = mlvl_scores.shape
    nms_fn = nms_bev_mask if use_rotate_nms else nms_normal_bev_mask

    def per_class(c):
        scores = mlvl_scores[:, c]
        valid = scores > score_thr
        keep = nms_fn(mlvl_bboxes_for_nms, scores, valid, iou_thr)
        return keep, scores

    keeps, scores_pc = jax.vmap(per_class)(jnp.arange(num_classes))
    # flatten class-major: [C*N]
    flat_keep = keeps.reshape(-1)
    flat_scores = jnp.where(flat_keep, scores_pc.reshape(-1), -jnp.inf)
    flat_labels = jnp.repeat(jnp.arange(num_classes), N)
    flat_box_idx = jnp.tile(jnp.arange(N), num_classes)

    top_scores, top_idx = jax.lax.top_k(flat_scores, max_out)
    mask = jnp.isfinite(top_scores)
    bidx = flat_box_idx[top_idx]
    out = dict(
        bboxes=mlvl_bboxes[bidx],
        scores=jnp.where(mask, top_scores, 0.0),
        labels=jnp.where(mask, flat_labels[top_idx], -1),
        mask=mask,
    )
    if mlvl_dir_scores is not None:
        out['dir_scores'] = mlvl_dir_scores[bidx]
    if mlvl_attr_scores is not None:
        out['attr_scores'] = mlvl_attr_scores[bidx]
    return out
