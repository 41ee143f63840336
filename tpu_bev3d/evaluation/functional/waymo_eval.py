"""Native Waymo detection evaluation: LEVEL_1/2 mAP, mAPH and LET-mAP.

Reimplements the Waymo Open Dataset metric protocol the reference calls
through the waymo-open-dataset package (ref: mmdet3d/evaluation/metrics/
waymo_metric.py:246 and the WOD metrics config):

- difficulty: LEVEL_2 = GT with ≤ 5 LiDAR points (or annotated level 2);
  LEVEL_1 eval uses only L1 GT; LEVEL_2 eval uses all GT
- matching: greedy by score on 3D IoU, per-class thresholds
  (Vehicle 0.7, Pedestrian/Cyclist 0.5, Sign 0.5)
- AP: 101-point interpolated precision envelope
- APH: every TP weighted by heading accuracy 1 - |Δθ|_wrapped / π
- LET (longitudinal-error-tolerant, the camera-only protocol): before
  IoU, the prediction center is shifted along its sensor ray to the
  closest point to the GT center, accepted within tolerance
  max(longitudinal_tolerance_pct · gt_range, min_tol); matched pairs
  contribute with longitudinal affinity 1 - |err| / tol (mAPL).

Inputs are per-sample numpy dicts; no TF / WOD dependency.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .kitti_eval import iou_3d_np

IOU_THRESHOLDS = {'Car': 0.7, 'Vehicle': 0.7, 'Pedestrian': 0.5,
                  'Cyclist': 0.5, 'Sign': 0.5}
LET_TOL_PCT = 0.1
LET_MIN_TOL = 0.5
N_INTERP = 101


def _heading_accuracy(a, b):
    d = np.abs(a - b) % (2 * np.pi)
    d = np.minimum(d, 2 * np.pi - d)
    return np.maximum(0.0, 1.0 - d / np.pi)


def _let_align(pred_boxes, gt_center):
    """Shift each pred center along its sensor ray to the point closest
    to the GT center; returns (aligned_boxes, long_err, tol)."""
    p = pred_boxes.copy()
    ray = p[:, :3]
    rng = np.linalg.norm(ray, axis=-1)
    u = ray / np.maximum(rng[:, None], 1e-6)
    proj = np.sum(gt_center * u, axis=-1)        # optimal range along ray
    long_err = np.abs(proj - rng)
    gt_range = np.linalg.norm(gt_center, axis=-1)
    tol = np.maximum(LET_TOL_PCT * gt_range, LET_MIN_TOL)
    p[:, :3] = u * proj[:, None]
    return p, long_err, tol


def _ap_from_records(records, npos, use_weight=False):
    """records: list of (score, tp_flag, weight). 101-pt envelope AP."""
    if npos == 0 or not records:
        return 0.0
    records = sorted(records, key=lambda r: -r[0])
    tp = np.asarray([r[1] for r in records], np.float64)
    w = np.asarray([r[2] for r in records], np.float64) if use_weight \
        else tp
    cum_w = np.cumsum(np.where(tp > 0, w, 0.0))
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(1 - tp)
    recall = cum_tp / npos
    precision = np.where(cum_tp > 0, cum_w / (cum_tp + cum_fp), 0.0)
    rec_i = np.linspace(0, 1, N_INTERP)
    prec_i = np.interp(rec_i, recall, precision, right=0)
    # precision envelope (monotone non-increasing)
    for i in range(N_INTERP - 2, -1, -1):
        prec_i[i] = max(prec_i[i], prec_i[i + 1])
    return float(np.mean(prec_i))


def _eval_class_level(preds, gts, iou_thr, level, let=False):
    """→ (AP, APH[, APL]) for one class at one difficulty level."""
    npos = 0
    rec_ap, rec_aph, rec_apl = [], [], []
    for p, g in zip(preds, gts):
        gb = g['boxes']
        glevel = g.get('levels')
        if glevel is None:
            npts = g.get('num_pts')
            glevel = (np.where(npts <= 5, 2, 1) if npts is not None
                      else np.ones(len(gb), np.int32))
        eligible = glevel <= level
        npos += int(eligible.sum())
        taken = np.zeros(len(gb), bool)
        order = np.argsort(-p['scores'])
        for i in order:
            pb = p['boxes'][i:i + 1]
            score = float(p['scores'][i])
            best_j, best_iou, best_aff = -1, 0.0, 0.0
            for j in range(len(gb)):
                if taken[j]:
                    continue
                if let:
                    aligned, lerr, tol = _let_align(pb, gb[j:j + 1, :3])
                    if lerr[0] > tol[0]:
                        continue
                    iou = iou_3d_np(aligned, gb[j:j + 1])[0, 0]
                    aff = max(0.0, 1.0 - lerr[0] / max(tol[0], 1e-6))
                else:
                    iou = iou_3d_np(pb, gb[j:j + 1])[0, 0]
                    aff = 1.0
                if iou >= iou_thr and iou > best_iou:
                    best_iou, best_j, best_aff = iou, j, aff
            if best_j >= 0:
                taken[best_j] = True
                if not eligible[best_j]:
                    continue        # match to higher-level GT: ignored
                ha = _heading_accuracy(p['boxes'][i, 6], gb[best_j, 6])
                rec_ap.append((score, 1.0, 1.0))
                rec_aph.append((score, 1.0, ha))
                rec_apl.append((score, 1.0, best_aff))
            else:
                rec_ap.append((score, 0.0, 0.0))
                rec_aph.append((score, 0.0, 0.0))
                rec_apl.append((score, 0.0, 0.0))
    ap = _ap_from_records(rec_ap, npos)
    aph = _ap_from_records(rec_aph, npos, use_weight=True)
    apl = _ap_from_records(rec_apl, npos, use_weight=True)
    return ap, aph, apl


def waymo_eval(predictions: List[dict], ground_truths: List[dict],
               classes: Sequence[str], let: bool = False
               ) -> Dict[str, float]:
    """predictions: per-sample dicts (boxes [N,7], labels, scores);
    ground_truths: boxes, labels, optional num_pts or levels [N].
    Returns {Class_LEVEL_k_mAP[H/L]} + means."""
    out: Dict[str, float] = {}
    prefix = 'LET_' if let else ''
    for level in (1, 2):
        aps, aphs, apls = [], [], []
        for ci, cname in enumerate(classes):
            thr = IOU_THRESHOLDS.get(cname, 0.5)
            cp = [dict(boxes=p['boxes'][p['labels'] == ci][:, :7],
                       scores=p['scores'][p['labels'] == ci])
                  for p in predictions]
            cg = []
            for g in ground_truths:
                sel = g['labels'] == ci
                d = dict(boxes=g['boxes'][sel][:, :7])
                if 'num_pts' in g:
                    d['num_pts'] = np.asarray(g['num_pts'])[sel]
                if 'levels' in g:
                    d['levels'] = np.asarray(g['levels'])[sel]
                cg.append(d)
            if sum(len(g['boxes']) for g in cg) == 0:
                continue
            ap, aph, apl = _eval_class_level(cp, cg, thr, level, let=let)
            out[f'{cname}_{prefix}LEVEL_{level}_AP'] = ap
            out[f'{cname}_{prefix}LEVEL_{level}_APH'] = aph
            if let:
                out[f'{cname}_{prefix}LEVEL_{level}_APL'] = apl
            aps.append(ap); aphs.append(aph); apls.append(apl)
        if aps:
            out[f'{prefix}LEVEL_{level}_mAP'] = float(np.mean(aps))
            out[f'{prefix}LEVEL_{level}_mAPH'] = float(np.mean(aphs))
            if let:
                out[f'{prefix}LEVEL_{level}_mAPL'] = float(np.mean(apls))
    return out
