"""Native nuScenes detection evaluation (NDS / mAP / TP metrics),
devkit-fidelity.

Reimplements the nuscenes-devkit DetectionEval algorithm the reference
delegates to (ref: projects/BEVFusion/evaluation/functional/nuscenes_utils/
eval.py:118-179 subclasses the devkit's DetectionEval; attribute rules and
class priors from utils.py:20-226) including the details the round-1
version missed:

- class-range filtering of GT and predictions (detection_cvpr_2019 ranges)
- GLOBAL confidence ordering across samples during matching
- 101-point interpolation with precision sliced STRICTLY above
  min_recall (index 11), per devkit calc_ap
- TP errors as devkit cummean curves interpolated in confidence space,
  averaged over [first_ind=11, max_recall_ind] (calc_tp)
- the 5th TP metric (attribute error) with the reference's
  velocity-threshold attribute assignment and per-class priors
- per-class undefined metrics (traffic_cone: attr/vel/orient; barrier:
  attr/vel; barrier orientation period π) via nanmean

Inputs are plain per-sample numpy dicts, no devkit objects.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

DIST_THS = (0.5, 1.0, 2.0, 4.0)
TP_DIST_TH = 2.0
TP_METRICS = ('trans_err', 'scale_err', 'orient_err', 'vel_err',
              'attr_err')
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
N_INTERP = 101
MAX_BOXES_PER_SAMPLE = 500

# detection_cvpr_2019 class ranges (meters from ego)
CLASS_RANGE = {
    'car': 50, 'truck': 50, 'bus': 50, 'trailer': 50,
    'construction_vehicle': 50, 'pedestrian': 40, 'motorcycle': 40,
    'bicycle': 40, 'traffic_cone': 30, 'barrier': 30,
}

# devkit: metrics undefined for some classes (set to NaN, skipped in means)
NAN_METRICS = {
    'traffic_cone': {'attr_err', 'vel_err', 'orient_err'},
    'barrier': {'attr_err', 'vel_err'},
}
PERIOD_PI_CLASSES = {'barrier'}

ATTRS = ('cycle.with_rider', 'cycle.without_rider', 'pedestrian.moving',
         'pedestrian.sitting_lying_down', 'pedestrian.standing',
         'vehicle.moving', 'vehicle.parked', 'vehicle.stopped', '')

# most-frequent attribute per class (ref utils.py:20 cls_attr_dist argmax)
DEFAULT_ATTR = {
    'barrier': '', 'traffic_cone': '',
    'bicycle': 'cycle.without_rider', 'motorcycle': 'cycle.without_rider',
    'bus': 'vehicle.moving', 'car': 'vehicle.parked',
    'construction_vehicle': 'vehicle.parked', 'trailer': 'vehicle.parked',
    'truck': 'vehicle.parked', 'pedestrian': 'pedestrian.moving',
}


def default_attr(class_name: str, velocity) -> str:
    """Velocity-threshold attribute rule (ref utils.py:156-212)."""
    speed = float(np.linalg.norm(np.asarray(velocity)[:2]))
    if speed > 0.2:
        if class_name in ('car', 'construction_vehicle', 'bus', 'truck',
                          'trailer'):
            return 'vehicle.moving'
        if class_name in ('bicycle', 'motorcycle'):
            return 'cycle.with_rider'
    else:
        if class_name == 'pedestrian':
            return 'pedestrian.standing'
        if class_name == 'bus':
            return 'vehicle.stopped'
    return DEFAULT_ATTR.get(class_name, '')


def _scale_iou(pred, gt):
    """Size-only 3D IoU of center/yaw-aligned boxes (devkit scale_iou)."""
    mins = np.minimum(pred[3:6], gt[3:6])
    inter = np.prod(mins)
    union = np.prod(pred[3:6]) + np.prod(gt[3:6]) - inter
    return inter / max(union, 1e-8)


def _yaw_diff(a, b, period=2 * np.pi):
    d = abs(a - b) % period
    return min(d, period - d)


def _cummean(x):
    x = np.asarray(x, np.float64)
    if np.all(np.isnan(x)):
        return np.ones_like(x)
    sum_ = np.nancumsum(x)
    count = np.cumsum(~np.isnan(x))
    return sum_ / np.maximum(count, 1)


def _filter_by_range(boxes, labels, classes, extra=()):
    """Class-range filter (devkit filter_eval_boxes; ego dist = |xy|)."""
    if len(boxes) == 0:
        return (boxes, labels) + tuple(extra)
    dist = np.linalg.norm(boxes[:, :2], axis=-1)
    rng = np.array([CLASS_RANGE.get(classes[l], 50) for l in labels])
    keep = dist < rng
    return (boxes[keep], labels[keep]) + tuple(e[keep] for e in extra)


def accumulate_class(preds: List[dict], gts: List[dict], class_name: str,
                     dist_th: float):
    """One (class, threshold) accumulation — devkit algo.py accumulate.

    preds/gts: per-sample dicts (already class-filtered) with 'boxes'
    [N, 7 or 9], 'scores' (preds), optional 'attrs' (str arrays).
    Matching follows the devkit exactly: all predictions of the class are
    sorted by confidence GLOBALLY (across samples) and greedily matched
    against unmatched GTs of their own sample by min center distance.
    """
    npos = sum(len(g['boxes']) for g in gts)
    # global sort across samples
    entries = []
    for si, p in enumerate(preds):
        for i in range(len(p['boxes'])):
            entries.append((float(p['scores'][i]), si, i))
    entries.sort(key=lambda e: -e[0])
    taken = [np.zeros(len(g['boxes']), bool) for g in gts]
    tp, fp, conf = [], [], []
    match = {m: [] for m in TP_METRICS}
    match['conf'] = []
    period = np.pi if class_name in PERIOD_PI_CLASSES else 2 * np.pi
    for score, si, i in entries:
        pb = preds[si]['boxes'][i]
        gb = gts[si]['boxes']
        best_j, best_d = -1, np.inf
        for j in range(len(gb)):
            if taken[si][j]:
                continue
            d = float(np.linalg.norm(pb[:2] - gb[j, :2]))
            if d < best_d:
                best_d, best_j = d, j
        if best_j >= 0 and best_d < dist_th:
            taken[si][best_j] = True
            tp.append(1); fp.append(0); conf.append(score)
            gt_box = gb[best_j]
            pvel = pb[7:9] if len(pb) > 8 else np.zeros(2)
            gvel = gt_box[7:9] if len(gt_box) > 8 else np.zeros(2)
            pattr = (preds[si]['attrs'][i] if 'attrs' in preds[si]
                     else default_attr(class_name, pvel))
            gattr = (gts[si]['attrs'][best_j] if 'attrs' in gts[si]
                     else default_attr(class_name, gvel))
            match['trans_err'].append(best_d)
            match['scale_err'].append(1.0 - _scale_iou(pb, gt_box))
            match['orient_err'].append(_yaw_diff(pb[6], gt_box[6], period))
            match['vel_err'].append(float(np.linalg.norm(pvel - gvel)))
            match['attr_err'].append(1.0 - float(pattr == gattr))
            match['conf'].append(score)
        else:
            tp.append(0); fp.append(1); conf.append(score)
    return dict(npos=npos, tp=tp, fp=fp, conf=conf, match=match)


def interp_md(acc: dict):
    """→ devkit DetectionMetricData: 101-point interpolated curves."""
    npos = acc['npos']
    rec_interp = np.linspace(0, 1, N_INTERP)
    if npos == 0 or len(acc['tp']) == 0 or sum(acc['tp']) == 0:
        return dict(precision=np.zeros(N_INTERP),
                    confidence=np.zeros(N_INTERP),
                    **{m: np.ones(N_INTERP) for m in TP_METRICS})
    tp = np.cumsum(acc['tp']).astype(np.float64)
    fp = np.cumsum(acc['fp']).astype(np.float64)
    conf = np.asarray(acc['conf'], np.float64)
    rec = tp / npos
    prec = tp / (tp + fp)
    precision = np.interp(rec_interp, rec, prec, right=0)
    confidence = np.interp(rec_interp, rec, conf, right=0)
    out = dict(precision=precision, confidence=confidence)
    mconf = np.asarray(acc['match']['conf'], np.float64)
    for m in TP_METRICS:
        tmp = _cummean(np.asarray(acc['match'][m], np.float64))
        # devkit: interpolate the cummean curve in CONFIDENCE space onto
        # the interpolated confidence grid
        out[m] = np.interp(confidence[::-1], mconf[::-1], tmp[::-1])[::-1]
    return out


def calc_ap(md) -> float:
    """devkit calc_ap: slice strictly above min_recall (index 11)."""
    prec = md['precision'].copy()
    prec = prec[round(100 * MIN_RECALL) + 1:]
    prec -= MIN_PRECISION
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - MIN_PRECISION)


def calc_tp(md, metric: str) -> float:
    """devkit calc_tp: mean over [11, max_recall_ind]."""
    first_ind = round(100 * MIN_RECALL) + 1
    nz = np.nonzero(md['confidence'])[0]
    last_ind = int(nz[-1]) if len(nz) else 0
    if last_ind < first_ind:
        return 1.0
    return float(np.mean(md[metric][first_ind:last_ind + 1]))


def nuscenes_eval(predictions: List[dict], ground_truths: List[dict],
                  classes: Sequence[str],
                  filter_range: bool = True) -> Dict[str, float]:
    """predictions/ground_truths: per-sample dicts with 'boxes' [N,7 or 9],
    'labels' [N], (preds) 'scores' [N], optional 'attrs' (str array [N]).
    Returns the devkit-style metric dict: per-class AP at each threshold,
    mAP, TP errors, 5-term NDS."""
    # ---- filtering (devkit filter_eval_boxes) ----
    fpred, fgt = [], []
    for p in predictions:
        b, l, s = p['boxes'], p['labels'], p['scores']
        if len(b) > MAX_BOXES_PER_SAMPLE:
            order = np.argsort(-s)[:MAX_BOXES_PER_SAMPLE]
            b, l, s = b[order], l[order], s[order]
        extra = [s] + ([p['attrs']] if 'attrs' in p else [])
        if filter_range:
            res = _filter_by_range(b, l, classes, extra)
        else:
            res = (b, l) + tuple(extra)
        d = dict(boxes=res[0], labels=res[1], scores=res[2])
        if 'attrs' in p:
            d['attrs'] = res[3]
        fpred.append(d)
    for g in ground_truths:
        b, l = g['boxes'], g['labels']
        extra = [g['attrs']] if 'attrs' in g else []
        if filter_range:
            res = _filter_by_range(b, l, classes, extra)
        else:
            res = (b, l) + tuple(extra)
        d = dict(boxes=res[0], labels=res[1])
        if 'attrs' in g:
            d['attrs'] = res[2]
        fgt.append(d)

    out = {}
    aps = []
    class_tp = {m: [] for m in TP_METRICS}
    for ci, cname in enumerate(classes):
        cp = []
        for p in fpred:
            sel = p['labels'] == ci
            d = dict(boxes=p['boxes'][sel], scores=p['scores'][sel])
            if 'attrs' in p:
                d['attrs'] = p['attrs'][sel]
            cp.append(d)
        cg = []
        for g in fgt:
            sel = g['labels'] == ci
            d = dict(boxes=g['boxes'][sel])
            if 'attrs' in g:
                d['attrs'] = g['attrs'][sel]
            cg.append(d)
        if sum(len(g['boxes']) for g in cg) == 0:
            # class absent from GT: undefined, excluded from means
            continue
        class_aps = []
        for th in DIST_THS:
            md = interp_md(accumulate_class(cp, cg, cname, th))
            ap = calc_ap(md)
            class_aps.append(ap)
            out[f'{cname}_AP_dist_{th}'] = ap
            if th == TP_DIST_TH:
                for m in TP_METRICS:
                    if m in NAN_METRICS.get(cname, ()):
                        out[f'{cname}_{m}'] = float('nan')
                        class_tp[m].append(np.nan)
                    else:
                        e = calc_tp(md, m)
                        out[f'{cname}_{m}'] = e
                        class_tp[m].append(e)
        out[f'{cname}_AP'] = float(np.mean(class_aps))
        aps.append(np.mean(class_aps))
    mAP = float(np.mean(aps)) if aps else 0.0
    out['mAP'] = mAP
    tp_score = 0.0
    for m in TP_METRICS:
        vals = [v for v in class_tp[m] if not np.isnan(v)]
        err = float(np.mean(vals)) if vals else 1.0
        out[f'm{m}'] = err
        tp_score += max(0.0, 1.0 - min(1.0, err))
    # devkit NDS: 5 TP metrics, mAP weight 5 → /10
    out['NDS'] = float((5 * mAP + tp_score) / 10.0)
    return out
