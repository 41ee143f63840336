"""Native Lyft detection evaluation.

Reimplements the Lyft devkit protocol the reference calls (ref:
mmdet3d/evaluation/metrics/lyft_metric.py → lyft_dataset_sdk eval):
mAP averaged over 3D-IoU thresholds {0.5, 0.55, …, 0.95}, per class,
with greedy score-ordered matching (each GT used once).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .kitti_eval import iou_3d_np

IOU_THRESHOLDS = tuple(np.arange(0.5, 1.0, 0.05).round(2))
N_INTERP = 101


def _class_ap(preds: List[dict], gts: List[dict], thr: float) -> float:
    npos = sum(len(g['boxes']) for g in gts)
    if npos == 0:
        return float('nan')
    records = []
    for p, g in zip(preds, gts):
        gb = g['boxes']
        taken = np.zeros(len(gb), bool)
        order = np.argsort(-p['scores'])
        iou = iou_3d_np(p['boxes'][:, :7], gb[:, :7]) \
            if len(p['boxes']) and len(gb) else \
            np.zeros((len(p['boxes']), len(gb)))
        for i in order:
            row = np.where(taken, -1.0, iou[i]) if len(gb) \
                else np.zeros(0)
            j = int(np.argmax(row)) if len(gb) else -1
            if j >= 0 and row[j] >= thr:
                taken[j] = True
                records.append((float(p['scores'][i]), 1))
            else:
                records.append((float(p['scores'][i]), 0))
    if not records:
        return 0.0
    records.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in records])
    fp = np.cumsum([1 - r[1] for r in records])
    rec = tp / npos
    prec = tp / np.maximum(tp + fp, 1)
    rec_i = np.linspace(0, 1, N_INTERP)
    prec_i = np.interp(rec_i, rec, prec, right=0)
    for i in range(N_INTERP - 2, -1, -1):
        prec_i[i] = max(prec_i[i], prec_i[i + 1])
    return float(np.mean(prec_i))


def lyft_eval(predictions: List[dict], ground_truths: List[dict],
              classes: Sequence[str]) -> Dict[str, float]:
    out: Dict[str, float] = {}
    per_class = []
    for ci, cname in enumerate(classes):
        cp = [dict(boxes=p['boxes'][p['labels'] == ci],
                   scores=p['scores'][p['labels'] == ci])
              for p in predictions]
        cg = [dict(boxes=g['boxes'][g['labels'] == ci])
              for g in ground_truths]
        if sum(len(g['boxes']) for g in cg) == 0:
            continue
        aps = [_class_ap(cp, cg, t) for t in IOU_THRESHOLDS]
        out[f'{cname}_AP'] = float(np.mean(aps))
        per_class.append(out[f'{cname}_AP'])
    out['mAP'] = float(np.mean(per_class)) if per_class else 0.0
    return out
