"""Native nuScenes detection evaluation (NDS / mAP / TP metrics).

Reimplements the nuscenes-devkit DetectionEval algorithm the reference calls
(ref: projects/BEVFusion/evaluation/functional/nuscenes_utils/eval.py:108-139
and mmdet3d/evaluation/metrics/nuscenes_metric.py:186) without the devkit:

- matching: greedy by confidence, center distance (BEV xy, meters) under
  thresholds {0.5, 1, 2, 4}
- AP: precision/recall integrated over recall in [0.1, 1], precisions
  clipped below 0.1 (devkit's calc_ap)
- TP metrics at threshold 2.0m over true positives: ATE (xy dist), ASE
  (1 - 3D IoU of aligned boxes), AOE (yaw diff, period 2π; π for barrier),
  AVE (velocity L2)
- NDS = (5·mAP + Σ_tp (1 - min(1, err))) / 10

Inputs are plain per-sample numpy dicts, no devkit objects.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

DIST_THS = (0.5, 1.0, 2.0, 4.0)
TP_DIST_TH = 2.0
TP_METRICS = ('trans_err', 'scale_err', 'orient_err', 'vel_err')

# classes where some TP metrics are undefined (devkit cfg)
NO_VEL_CLASSES = {'barrier', 'traffic_cone'}
NO_ORIENT_CLASSES = {'traffic_cone'}
PERIOD_PI_CLASSES = {'barrier'}


def _center_dist(a, b):
    return np.linalg.norm(a[:, None, :2] - b[None, :, :2], axis=-1)


def _aligned_iou3d(pred, gt):
    """Size-only 3D IoU of center-aligned boxes (devkit scale_iou)."""
    mins = np.minimum(pred[3:6], gt[3:6])
    inter = np.prod(mins)
    union = np.prod(pred[3:6]) + np.prod(gt[3:6]) - inter
    return inter / max(union, 1e-8)


def _yaw_diff(a, b, period=2 * np.pi):
    d = (a - b) % period
    return min(d, period - d)


def accumulate_class(preds: List[dict], gts: List[dict], class_name: str,
                     dist_th: float):
    """One (class, threshold) accumulation over all samples.

    preds/gts: per-sample dicts with 'boxes' [N,9] (x,y,z,dx,dy,dz,yaw,
    vx,vy), 'scores' [N] (preds only), 'labels' (already filtered to class
    by caller). Returns dict with sortable match records.
    """
    npos = sum(len(g['boxes']) for g in gts)
    records = []  # (score, is_tp, trans_err, scale_err, orient_err, vel_err)
    for pred, gt in zip(preds, gts):
        pb, ps = pred['boxes'], pred['scores']
        gb = gt['boxes']
        taken = np.zeros(len(gb), bool)
        order = np.argsort(-ps)
        if len(gb):
            dist = _center_dist(pb, gb)
        for i in order:
            if len(gb) == 0:
                records.append((ps[i], False, None))
                continue
            d = np.where(taken, np.inf, dist[i])
            j = int(np.argmin(d))
            if d[j] < dist_th:
                taken[j] = True
                period = np.pi if class_name in PERIOD_PI_CLASSES \
                    else 2 * np.pi
                tp_err = dict(
                    trans_err=float(d[j]),
                    scale_err=1.0 - _aligned_iou3d(pb[i], gb[j]),
                    orient_err=float(_yaw_diff(pb[i, 6], gb[j, 6], period)),
                    vel_err=float(np.linalg.norm(pb[i, 7:9] - gb[j, 7:9]))
                    if pb.shape[1] > 8 and gb.shape[1] > 8 else 0.0)
                records.append((ps[i], True, tp_err))
            else:
                records.append((ps[i], False, None))
    return dict(npos=npos, records=records)


def calc_ap_and_tp(acc: dict, class_name: str):
    """devkit calc_ap (min_recall 0.1, min_precision 0.1) + mean TP errors
    over TPs in the top-scoring prefix up to max recall."""
    npos = acc['npos']
    recs = sorted(acc['records'], key=lambda r: -r[0])
    if npos == 0 or not recs:
        return 0.0, {m: 1.0 for m in TP_METRICS}
    tps = np.cumsum([r[1] for r in recs])
    fps = np.cumsum([not r[1] for r in recs])
    recall = tps / npos
    precision = tps / np.maximum(tps + fps, 1)
    # interpolate over 101 recall points (devkit uses np.interp on 0..1)
    rec_interp = np.linspace(0, 1, 101)
    prec = np.interp(rec_interp, recall, precision, right=0)
    prec = prec[rec_interp >= 0.1]
    prec = np.maximum(prec - 0.1, 0) / 0.9
    ap = float(np.mean(prec))

    tp_errs = {m: [] for m in TP_METRICS}
    for r in recs:
        if r[1]:
            for m in TP_METRICS:
                tp_errs[m].append(r[2][m])
    mean_errs = {}
    for m in TP_METRICS:
        if (m == 'vel_err' and class_name in NO_VEL_CLASSES) or \
           (m == 'orient_err' and class_name in NO_ORIENT_CLASSES):
            mean_errs[m] = np.nan
        else:
            mean_errs[m] = float(np.mean(tp_errs[m])) if tp_errs[m] else 1.0
    return ap, mean_errs


def nuscenes_eval(predictions: List[dict], ground_truths: List[dict],
                  classes: Sequence[str]) -> Dict[str, float]:
    """predictions/ground_truths: per-sample dicts with 'boxes' [N,7 or 9],
    'labels' [N], and (preds) 'scores' [N]. Returns the devkit-style metric
    dict: per-class AP at each threshold, mAP, TP errors, NDS."""
    out = {}
    aps = []
    tp_sums = {m: [] for m in TP_METRICS}
    for ci, cname in enumerate(classes):
        cp = [dict(boxes=p['boxes'][p['labels'] == ci],
                   scores=p['scores'][p['labels'] == ci])
              for p in predictions]
        cg = [dict(boxes=g['boxes'][g['labels'] == ci])
              for g in ground_truths]
        if sum(len(g['boxes']) for g in cg) == 0:
            # class absent from GT: undefined AP, excluded from the mean
            # (devkit behavior for missing classes)
            continue
        class_aps = []
        for th in DIST_THS:
            acc = accumulate_class(cp, cg, cname, th)
            ap, errs = calc_ap_and_tp(acc, cname)
            class_aps.append(ap)
            out[f'{cname}_AP_dist_{th}'] = ap
            if th == TP_DIST_TH:
                for m in TP_METRICS:
                    out[f'{cname}_{m}'] = errs[m]
                    if not np.isnan(errs[m]):
                        tp_sums[m].append(errs[m])
        out[f'{cname}_AP'] = float(np.mean(class_aps))
        aps.append(np.mean(class_aps))
    mAP = float(np.mean(aps)) if aps else 0.0
    out['mAP'] = mAP
    tp_score = 0.0
    for m in TP_METRICS:
        err = float(np.mean(tp_sums[m])) if tp_sums[m] else 1.0
        out[f'm{m}'] = err
        tp_score += max(0.0, 1.0 - min(1.0, err))
    # NDS over 4 TP metrics (devkit has 5 incl. attr_err; without attribute
    # predictions we follow the reference's custom eval which drops it —
    # projects/BEVFusion/evaluation .. NuScenesCustomMetric)
    out['NDS'] = float((5 * mAP + tp_score) / (5 + len(TP_METRICS)))
    return out
