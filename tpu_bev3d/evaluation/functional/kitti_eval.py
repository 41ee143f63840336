"""Native KITTI 3D detection evaluation (numpy), official-protocol.

Reimplements the reference's numba KITTI eval (ref: mmdet3d/evaluation/
functional/kitti_utils/eval.py — clean_data:9-70, get_thresholds:?,
compute_statistics_jit:73-214, eval_class:150-294, get_mAP40) faithfully:

- difficulty buckets easy/moderate/hard via 2D-box height / occlusion /
  truncation (MIN_HEIGHT 40/25/25 px, MAX_OCCLUSION 0/1/2,
  MAX_TRUNCATION .15/.3/.5)
- neighboring-class ignores (Van↔Car, Person_sitting↔Pedestrian) and
  DontCare regions (2D metric FP subtraction)
- the official score-threshold protocol: 41 recall sample points from TP
  scores, right-max precision smoothing, AP40 = mean over thresholds 1..40
- AOS orientation similarity on the 2D bbox metric
- vectorized rotated-BEV/3D IoU (candidate-vertex polygon intersection,
  no per-pair Python clipping)

Inputs are per-sample numpy dicts. Difficulty metadata (bbox2d, occluded,
truncated, names incl. 'DontCare') is optional — absent, every GT counts
for every difficulty (LiDAR-only datasets), matching the round-1 behavior.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ...structures import boxes3d as B

IOU_THRESHOLDS = {  # official moderate thresholds (3d/bev); 2D uses same
    'Car': 0.7, 'Pedestrian': 0.5, 'Cyclist': 0.5}
MIN_HEIGHT = (40.0, 25.0, 25.0)
MAX_OCCLUSION = (0, 1, 2)
MAX_TRUNCATION = (0.15, 0.30, 0.50)
DIFFICULTIES = ('easy', 'moderate', 'hard')
NEIGHBOR_CLASS = {'Car': 'Van', 'Pedestrian': 'Person_sitting'}
N_SAMPLE_PTS = 41


# --------------------------------------------------------------- IoU ops

def _corners_bev_np(boxes):
    return np.asarray(B.corners_bev(boxes))


def _point_in_quad_np(pts, quad):
    """pts [P,K,2] in CCW quads [P,4,2] → [P,K] bool."""
    out = np.ones(pts.shape[:2], bool)
    for k in range(4):
        a = quad[:, k]                       # [P,2]
        b = quad[:, (k + 1) % 4]
        e = b - a
        v = pts - a[:, None]
        cr = e[:, None, 0] * v[..., 1] - e[:, None, 1] * v[..., 0]
        out &= cr >= -1e-8
    return out


def _quad_orient(quad):
    """Ensure CCW orientation."""
    x, y = quad[..., 0], quad[..., 1]
    area2 = np.sum(x * np.roll(y, -1, -1) - y * np.roll(x, -1, -1), -1)
    flip = area2 < 0
    q = quad.copy()
    q[flip] = q[flip][:, ::-1]
    return q


def _seg_inter_np(q1, q2):
    """All 16 edge-pair intersections of two quads → [P,16,2], [P,16]."""
    P = q1.shape[0]
    a = np.repeat(q1, 4, axis=1)                           # [P,16,2] starts
    b = np.repeat(np.roll(q1, -1, axis=1), 4, axis=1)
    c = np.tile(q2, (1, 4, 1))
    d = np.tile(np.roll(q2, -1, axis=1), (1, 4, 1))
    r = b - a
    s = d - c
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qa = c - a
    t = (qa[..., 0] * s[..., 1] - qa[..., 1] * s[..., 0]) \
        / np.where(np.abs(denom) < 1e-12, 1.0, denom)
    u = (qa[..., 0] * r[..., 1] - qa[..., 1] * r[..., 0]) \
        / np.where(np.abs(denom) < 1e-12, 1.0, denom)
    ok = (np.abs(denom) > 1e-12) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = a + t[..., None] * r
    return pts, ok


def _convex_area_np(cand, valid):
    """Area of the convex hull of valid candidate points [P,K,2]."""
    cnt = np.maximum(valid.sum(-1), 1)
    ctr = np.sum(np.where(valid[..., None], cand, 0), 1) / cnt[:, None]
    ang = np.arctan2(cand[..., 1] - ctr[:, None, 1],
                     cand[..., 0] - ctr[:, None, 0])
    ang = np.where(valid, ang, 1e9)          # invalid sorted last
    order = np.argsort(ang, axis=1)
    cand = np.take_along_axis(cand, order[..., None], 1)
    valid_s = np.take_along_axis(valid, order, 1)
    first = cand[:, :1]
    cand = np.where(valid_s[..., None], cand, first)
    x, y = cand[..., 0], cand[..., 1]
    area = 0.5 * np.abs(np.sum(
        x * np.roll(y, -1, -1) - y * np.roll(x, -1, -1), -1))
    return np.where(valid.sum(-1) >= 3, area, 0.0)


def rotated_overlaps_bev_np(boxes1, boxes2):
    """[N,7],[M,7] → intersection areas [N,M], fully vectorized."""
    N, M = len(boxes1), len(boxes2)
    if N == 0 or M == 0:
        return np.zeros((N, M), np.float32)
    q1 = _quad_orient(_corners_bev_np(boxes1))             # [N,4,2]
    q2 = _quad_orient(_corners_bev_np(boxes2))             # [M,4,2]
    Q1 = np.repeat(q1, M, axis=0)                          # [N*M,4,2]
    Q2 = np.tile(q2, (N, 1, 1))
    in12 = _point_in_quad_np(Q1, Q2)                       # [P,4]
    in21 = _point_in_quad_np(Q2, Q1)
    inter_pts, inter_ok = _seg_inter_np(Q1, Q2)
    cand = np.concatenate([Q1, Q2, inter_pts], axis=1)     # [P,24,2]
    valid = np.concatenate([in12, in21, inter_ok], axis=1)
    return _convex_area_np(cand, valid).reshape(N, M).astype(np.float32)


def rotated_iou_bev_np(boxes1, boxes2):
    inter = rotated_overlaps_bev_np(boxes1, boxes2)
    if inter.size == 0:
        return inter
    a1 = boxes1[:, 3] * boxes1[:, 4]
    a2 = boxes2[:, 3] * boxes2[:, 4]
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-8)


def iou_3d_np(boxes1, boxes2):
    """Full 3D IoU [N,M] (bottom-center z origin)."""
    inter_bev = rotated_overlaps_bev_np(boxes1, boxes2)
    if inter_bev.size == 0:
        return inter_bev
    zlo1, zhi1 = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    zlo2, zhi2 = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    zo = np.maximum(np.minimum(zhi1[:, None], zhi2[None, :])
                    - np.maximum(zlo1[:, None], zlo2[None, :]), 0)
    inter = inter_bev * zo
    v1 = np.prod(boxes1[:, 3:6], -1)
    v2 = np.prod(boxes2[:, 3:6], -1)
    return inter / np.maximum(v1[:, None] + v2[None, :] - inter, 1e-8)


def iou_2d_np(b1, b2):
    """Axis-aligned image-box IoU [N,M]; boxes [x1,y1,x2,y2]."""
    if len(b1) == 0 or len(b2) == 0:
        return np.zeros((len(b1), len(b2)), np.float32)
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-8)


# ------------------------------------------------------ official protocol

def clean_data(gt, dt, class_name: str, difficulty: int):
    """ref eval.py clean_data: per-frame care/ignore partitions.

    Returns (num_valid_gt, ignored_gt [-1/0/1 per gt], ignored_dt,
    dc_mask over gt rows).
    """
    names = gt.get('names')
    n_gt = len(gt['boxes'])
    if names is None:
        # LiDAR-only info: everything of the class is care at every
        # difficulty
        care = gt['labels'] == gt['_class_idx']
        ignored_gt = np.where(care, 0, -1)
        dc = np.zeros(n_gt, bool)
        n_valid = int(care.sum())
    else:
        ignored_gt = np.full(n_gt, -1, np.int32)
        dc = np.asarray([n == 'DontCare' for n in names])
        occ = np.asarray(gt.get('occluded', np.zeros(n_gt)))
        trunc = np.asarray(gt.get('truncated', np.zeros(n_gt)))
        bbox2d = np.asarray(gt.get('bbox2d',
                                   np.tile([0, 0, 100, 100], (n_gt, 1))))
        height = bbox2d[:, 3] - bbox2d[:, 1]
        n_valid = 0
        neighbor = NEIGHBOR_CLASS.get(class_name)
        for i in range(n_gt):
            if names[i] == class_name:
                valid_class = 1
            elif neighbor is not None and names[i] == neighbor:
                valid_class = 0
            else:
                valid_class = -1
            ignore = (occ[i] > MAX_OCCLUSION[difficulty]
                      or trunc[i] > MAX_TRUNCATION[difficulty]
                      or height[i] <= MIN_HEIGHT[difficulty])
            if valid_class == 1 and not ignore:
                ignored_gt[i] = 0
                n_valid += 1
            elif valid_class == 0 or (ignore and valid_class == 1):
                ignored_gt[i] = 1
    n_dt = len(dt['boxes'])
    ignored_dt = np.zeros(n_dt, np.int32)
    if 'bbox2d' in dt:
        h = dt['bbox2d'][:, 3] - dt['bbox2d'][:, 1]
        ignored_dt = np.where(h < MIN_HEIGHT[difficulty], 1, 0)
    return n_valid, ignored_gt, ignored_dt, dc


def get_thresholds(scores, num_gt, num_sample_pts=N_SAMPLE_PTS):
    """ref eval.py get_thresholds: recall-sampled score thresholds."""
    scores = np.sort(scores)[::-1]
    thresholds = []
    current_recall = 0.0
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)
                and i < len(scores) - 1):
            continue
        thresholds.append(score)
        current_recall += 1.0 / (num_sample_pts - 1)
    return thresholds


def compute_statistics(overlaps, gt, dt, ignored_gt, ignored_dt, dc_mask,
                       min_overlap, thresh, compute_fp, compute_aos=False,
                       metric=0, dc_overlaps=None):
    """ref compute_statistics_jit:73-214 (single frame)."""
    NO_DET = -10000000.0
    dt_scores = dt['scores']
    n_gt, n_dt = len(ignored_gt), len(ignored_dt)
    assigned = np.zeros(n_dt, bool)
    ignored_threshold = (dt_scores < thresh) if compute_fp \
        else np.zeros(n_dt, bool)
    tp = fp = fn = 0
    similarity = 0.0
    thresholds = []
    for j in range(n_gt):
        if ignored_gt[j] == -1:
            continue
        det_idx = -1
        valid_detection = NO_DET
        max_overlap = 0.0
        assigned_ignored_det = False
        for i in range(n_dt):
            if ignored_dt[i] == -1 or assigned[i] or ignored_threshold[i]:
                continue
            overlap = overlaps[i, j]
            score = dt_scores[i]
            if (not compute_fp and overlap > min_overlap
                    and score > valid_detection):
                det_idx = i
                valid_detection = score
            elif (compute_fp and overlap > min_overlap
                  and (overlap > max_overlap or assigned_ignored_det)
                  and ignored_dt[i] == 0):
                max_overlap = overlap
                det_idx = i
                valid_detection = 1
                assigned_ignored_det = False
            elif (compute_fp and overlap > min_overlap
                  and valid_detection == NO_DET and ignored_dt[i] == 1):
                det_idx = i
                valid_detection = 1
                assigned_ignored_det = True
        if valid_detection == NO_DET and ignored_gt[j] == 0:
            fn += 1
        elif valid_detection != NO_DET and (ignored_gt[j] == 1
                                            or ignored_dt[det_idx] == 1):
            assigned[det_idx] = True
        elif valid_detection != NO_DET:
            tp += 1
            thresholds.append(dt_scores[det_idx])
            if compute_aos:
                delta = gt['alphas'][j] - dt['alphas'][det_idx]
                similarity += (1.0 + np.cos(delta)) / 2.0
            assigned[det_idx] = True
    if compute_fp:
        for i in range(n_dt):
            if not (assigned[i] or ignored_dt[i] == -1
                    or ignored_dt[i] == 1 or ignored_threshold[i]):
                fp += 1
        # DontCare: only the 2D bbox metric subtracts dets inside DC areas
        if metric == 0 and dc_overlaps is not None and dc_overlaps.size:
            nstuff = 0
            for i in range(n_dt):
                if (assigned[i] or ignored_dt[i] == -1 or ignored_dt[i] == 1
                        or ignored_threshold[i]):
                    continue
                if np.any(dc_overlaps[i] > min_overlap):
                    nstuff += 1
                    assigned[i] = True
            fp -= nstuff
    return tp, fp, fn, similarity, thresholds


def eval_class(preds: List[dict], gts: List[dict], class_name: str,
               class_idx: int, difficulty: int, metric: str,
               min_overlap: float, compute_aos: bool = False):
    """ref eval_class:150-294 for one (class, difficulty, metric)."""
    metric_id = {'bbox': 0, 'bev': 1, '3d': 2}[metric]
    frames = []
    total_valid = 0
    for p, g in zip(preds, gts):
        g = dict(g)
        g['_class_idx'] = class_idx
        n_valid, ig_gt, ig_dt, dc = clean_data(g, p, class_name, difficulty)
        # detections of this class only
        dsel = p['labels'] == class_idx
        dt = {k: np.asarray(v)[dsel] for k, v in p.items()
              if isinstance(v, np.ndarray) and len(np.shape(v))
              and np.shape(v)[0] == len(p['labels'])}
        ig_dt = ig_dt[dsel] if len(ig_dt) == len(dsel) else ig_dt
        # GT rows participating (care + ignored of this class context)
        gsel = ig_gt >= 0
        gt_part = {k: np.asarray(v)[gsel] for k, v in g.items()
                   if isinstance(v, np.ndarray) and len(np.shape(v))
                   and np.shape(v)[0] == len(ig_gt)}
        ig_gt_part = ig_gt[gsel]
        if metric_id == 0:
            ov = iou_2d_np(dt.get('bbox2d', np.zeros((0, 4))),
                           gt_part.get('bbox2d', np.zeros((0, 4))))
            dc_ov = iou_2d_np(dt.get('bbox2d', np.zeros((0, 4))),
                              np.asarray(g.get('bbox2d',
                                               np.zeros((0, 4))))[dc]
                              if dc.any() else np.zeros((0, 4)))
        elif metric_id == 1:
            ov = rotated_iou_bev_np(dt['boxes'], gt_part['boxes']) \
                if len(dt['boxes']) and len(gt_part['boxes']) \
                else np.zeros((len(dt['boxes']), len(gt_part['boxes'])))
            dc_ov = None
        else:
            ov = iou_3d_np(dt['boxes'], gt_part['boxes']) \
                if len(dt['boxes']) and len(gt_part['boxes']) \
                else np.zeros((len(dt['boxes']), len(gt_part['boxes'])))
            dc_ov = None
        frames.append((ov, gt_part, dt, ig_gt_part, ig_dt, dc, dc_ov))
        total_valid += n_valid
    if total_valid == 0:
        return None
    # native fast path: the C++ statistics kernel plays the reference's
    # numba-jitted compute_statistics_jit role (csrc/kitti_stats.cc);
    # the Python loop below stays as the documented fallback + oracle
    from .kitti_native import (accumulate_stats, available,
                               collect_tp_scores)
    use_native = available()
    # pass 1: collect TP scores at thresh -inf
    all_scores = []
    for ov, gt_part, dt, ig_gt_part, ig_dt, dc, dc_ov in frames:
        if use_native:
            all_scores.extend(collect_tp_scores(
                ov, dt.get('scores', np.zeros((0,))), ig_gt_part, ig_dt,
                min_overlap))
        else:
            _, _, _, _, th = compute_statistics(
                ov, gt_part, dt, ig_gt_part, ig_dt, dc,
                min_overlap, -np.inf, compute_fp=False, metric=metric_id,
                dc_overlaps=dc_ov)
            all_scores.extend(th)
    thresholds = get_thresholds(np.asarray(all_scores), total_valid)
    if not thresholds:
        # GT exists but no detection ever matched: AP is defined and zero
        return dict(precision=np.zeros(N_SAMPLE_PTS),
                    aos=np.zeros(N_SAMPLE_PTS))
    pr = np.zeros((len(thresholds), 4))
    if use_native:
        n_th = len(thresholds)
        tp = np.zeros(n_th, np.int64)
        fp = np.zeros(n_th, np.int64)
        fn = np.zeros(n_th, np.int64)
        sim = np.zeros(n_th, np.float64)
        for ov, gt_part, dt, ig_gt_part, ig_dt, dc, dc_ov in frames:
            accumulate_stats(
                ov, dt.get('scores', np.zeros((0,))),
                gt_part.get('alphas'), dt.get('alphas'),
                ig_gt_part, ig_dt, dc_ov, min_overlap, thresholds,
                compute_aos and gt_part.get('alphas') is not None
                and dt.get('alphas') is not None,
                metric_id, tp, fp, fn, sim)
        pr[:, 0], pr[:, 1], pr[:, 2], pr[:, 3] = tp, fp, fn, sim
    else:
        for ov, gt_part, dt, ig_gt_part, ig_dt, dc, dc_ov in frames:
            for t, th in enumerate(thresholds):
                tp, fp, fn, sim, _ = compute_statistics(
                    ov, gt_part, dt, ig_gt_part, ig_dt, dc, min_overlap,
                    th, compute_fp=True, compute_aos=compute_aos,
                    metric=metric_id, dc_overlaps=dc_ov)
                pr[t] += [tp, fp, fn, sim]
    n_th = len(thresholds)
    precision = np.zeros(N_SAMPLE_PTS)
    aos = np.zeros(N_SAMPLE_PTS)
    for t in range(n_th):
        precision[t] = pr[t, 0] / max(pr[t, 0] + pr[t, 1], 1e-8)
        if compute_aos:
            aos[t] = pr[t, 3] / max(pr[t, 0] + pr[t, 1], 1e-8)
    # right-max smoothing (ref :282-287)
    for t in range(N_SAMPLE_PTS):
        precision[t] = precision[t:].max()
        if compute_aos:
            aos[t] = aos[t:].max()
    return dict(precision=precision, aos=aos)


def _ap40(vals):
    """AP40 = mean over sample points 1..40 (ref get_mAP40)."""
    return float(np.sum(vals[1:N_SAMPLE_PTS]) / 40.0 * 100.0)


def _ap11(vals):
    """AP11 = mean over points 0, 4, 8, ... 40 (ref get_mAP11)."""
    return float(np.mean(vals[0:N_SAMPLE_PTS:4]) * 100.0)


def kitti_eval(predictions: List[dict], ground_truths: List[dict],
               classes: Sequence[str],
               metrics: Sequence[str] = ('bev', '3d'),
               difficulties: Sequence[int] = (0, 1, 2),
               compute_aos: bool = False,
               ap_mode: int = 40) -> Dict[str, float]:
    """predictions/ground_truths: per-sample dicts with 'boxes' [N,7]
    (LiDAR frame), 'labels' [N], preds also 'scores'. Optional per-sample
    keys enabling the full official protocol: 'names' (str list incl.
    'DontCare'), 'bbox2d' [N,4], 'occluded' [N], 'truncated' [N],
    'alphas' [N] (for AOS).

    Returns {Class_metric_difficulty_APxx: value} plus means. Without
    difficulty metadata the three difficulty entries coincide (all GT
    count), keeping LiDAR-only evals valid.
    """
    ap_fn = _ap40 if ap_mode == 40 else _ap11
    suffix = f'AP{ap_mode}'
    out: Dict[str, float] = {}
    for metric in metrics:
        for d in difficulties:
            aps = []
            for ci, cname in enumerate(classes):
                thr = IOU_THRESHOLDS.get(cname, 0.5)
                r = eval_class(predictions, ground_truths, cname, ci, d,
                               metric, thr,
                               compute_aos=compute_aos and metric == 'bbox')
                if r is None:
                    continue
                ap = ap_fn(r['precision'])
                out[f'{cname}_{metric}_{DIFFICULTIES[d]}_{suffix}'] = ap
                if compute_aos and metric == 'bbox':
                    out[f'{cname}_aos_{DIFFICULTIES[d]}_{suffix}'] = \
                        ap_fn(r['aos'])
                aps.append(ap)
            if aps:
                out[f'm{metric}_{DIFFICULTIES[d]}_{suffix}'] = \
                    float(np.mean(aps))
        # legacy aliases (moderate difficulty, round-1 key names)
        for ci, cname in enumerate(classes):
            k = f'{cname}_{metric}_moderate_{suffix}'
            if k in out:
                out[f'{cname}_{metric}_{suffix}'] = out[k]
        if f'm{metric}_moderate_{suffix}' in out:
            out[f'm{metric}_{suffix}'] = out[f'm{metric}_moderate_{suffix}']
    return out
