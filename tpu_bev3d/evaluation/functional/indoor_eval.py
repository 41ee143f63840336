"""Indoor detection / instance-seg / panoptic-seg evaluation.

Refs: mmdet3d/evaluation/functional/indoor_eval.py (AP at 3D-IoU
0.25/0.5, per class, all-point interpolation), scannet_utils
instance-seg protocol (mask-IoU AP@25/50) and panoptic_seg_metric.py
(PQ = Σ IoU(TP) / (TP + FP/2 + FN/2)).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .kitti_eval import iou_3d_np


def _class_ap(preds, gts, thr):
    npos = sum(len(g['boxes']) for g in gts)
    if npos == 0:
        return float('nan')
    recs = []
    for p, g in zip(preds, gts):
        gb = g['boxes']
        taken = np.zeros(len(gb), bool)
        iou = iou_3d_np(p['boxes'][:, :7], gb[:, :7]) \
            if len(p['boxes']) and len(gb) else \
            np.zeros((len(p['boxes']), len(gb)))
        for i in np.argsort(-p['scores']):
            row = np.where(taken, -1.0, iou[i]) if len(gb) else np.zeros(0)
            j = int(np.argmax(row)) if len(gb) else -1
            ok = j >= 0 and row[j] >= thr
            if ok:
                taken[j] = True
            recs.append((float(p['scores'][i]), int(ok)))
    if not recs:
        return 0.0
    recs.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in recs])
    fp = np.cumsum([1 - r[1] for r in recs])
    rec = tp / npos
    prec = tp / np.maximum(tp + fp, 1)
    # all-point interpolation (ref indoor_eval average_precision)
    mrec = np.concatenate([[0], rec, [1]])
    mpre = np.concatenate([[0], prec, [0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def indoor_eval(predictions: List[dict], ground_truths: List[dict],
                classes: Sequence[str],
                iou_thrs: Sequence[float] = (0.25, 0.5)
                ) -> Dict[str, float]:
    out: Dict[str, float] = {}
    for thr in iou_thrs:
        aps = []
        for ci, cname in enumerate(classes):
            cp = [dict(boxes=p['boxes'][p['labels'] == ci],
                       scores=p['scores'][p['labels'] == ci])
                  for p in predictions]
            cg = [dict(boxes=g['boxes'][g['labels'] == ci])
                  for g in ground_truths]
            if sum(len(g['boxes']) for g in cg) == 0:
                continue
            ap = _class_ap(cp, cg, thr)
            out[f'{cname}_AP_{thr:.2f}'] = ap
            aps.append(ap)
        out[f'mAP_{thr:.2f}'] = float(np.mean(aps)) if aps else 0.0
    return out


def instance_seg_eval(pred_instances: List[dict], gt_instances: List[dict],
                      classes: Sequence[str],
                      iou_thrs: Sequence[float] = (0.25, 0.5)
                      ) -> Dict[str, float]:
    """per-sample dicts: pred {masks [I, P] bool, labels [I], scores [I]},
    gt {masks [J, P] bool, labels [J]} (mask-IoU matching)."""
    out: Dict[str, float] = {}
    for thr in iou_thrs:
        aps = []
        for ci, cname in enumerate(classes):
            npos = 0
            recs = []
            for p, g in zip(pred_instances, gt_instances):
                gi = [j for j in range(len(g['labels']))
                      if g['labels'][j] == ci]
                npos += len(gi)
                pi = [i for i in range(len(p['labels']))
                      if p['labels'][i] == ci]
                taken = set()
                for i in sorted(pi, key=lambda i: -p['scores'][i]):
                    best_j, best = -1, 0.0
                    for j in gi:
                        if j in taken:
                            continue
                        inter = np.sum(p['masks'][i] & g['masks'][j])
                        union = np.sum(p['masks'][i] | g['masks'][j])
                        iou = inter / max(union, 1)
                        if iou > best:
                            best, best_j = iou, j
                    ok = best >= thr
                    if ok:
                        taken.add(best_j)
                    recs.append((float(p['scores'][i]), int(ok)))
            if npos == 0:
                continue
            if not recs:
                aps.append(0.0)
                continue
            recs.sort(key=lambda r: -r[0])
            tp = np.cumsum([r[1] for r in recs])
            fp = np.cumsum([1 - r[1] for r in recs])
            rec = tp / npos
            prec = tp / np.maximum(tp + fp, 1)
            mrec = np.concatenate([[0], rec, [1]])
            mpre = np.concatenate([[0], prec, [0]])
            for i in range(len(mpre) - 2, -1, -1):
                mpre[i] = max(mpre[i], mpre[i + 1])
            idx = np.where(mrec[1:] != mrec[:-1])[0]
            ap = float(np.sum((mrec[idx + 1] - mrec[idx])
                              * mpre[idx + 1]))
            out[f'{cname}_inst_AP_{thr:.2f}'] = ap
            aps.append(ap)
        out[f'inst_mAP_{thr:.2f}'] = float(np.mean(aps)) if aps else 0.0
    return out


def panoptic_seg_eval(pred_panoptic: List[dict], gt_panoptic: List[dict],
                      classes: Sequence[str],
                      iou_thr: float = 0.5) -> Dict[str, float]:
    """per-sample dicts {sem [P], inst [P]} (inst id 0 = stuff/void per
    point). PQ per class = Σ IoU(TP) / (|TP| + |FP|/2 + |FN|/2)."""
    tp = np.zeros(len(classes))
    fp = np.zeros(len(classes))
    fn = np.zeros(len(classes))
    iou_sum = np.zeros(len(classes))
    for p, g in zip(pred_panoptic, gt_panoptic):
        for ci in range(len(classes)):
            p_ids = np.unique(p['inst'][(p['sem'] == ci)
                                        & (p['inst'] > 0)])
            g_ids = np.unique(g['inst'][(g['sem'] == ci)
                                        & (g['inst'] > 0)])
            taken = set()
            matched_p = set()
            for pid in p_ids:
                pm = (p['inst'] == pid) & (p['sem'] == ci)
                best_j, best = -1, 0.0
                for gid in g_ids:
                    if gid in taken:
                        continue
                    gm = (g['inst'] == gid) & (g['sem'] == ci)
                    iou = np.sum(pm & gm) / max(np.sum(pm | gm), 1)
                    if iou > best:
                        best, best_j = iou, gid
                if best >= iou_thr:
                    taken.add(best_j)
                    matched_p.add(pid)
                    tp[ci] += 1
                    iou_sum[ci] += best
            fp[ci] += len(p_ids) - len(matched_p)
            fn[ci] += len(g_ids) - len(taken)
    out: Dict[str, float] = {}
    pqs = []
    for ci, cname in enumerate(classes):
        denom = tp[ci] + fp[ci] / 2 + fn[ci] / 2
        if denom == 0:
            continue
        pq = iou_sum[ci] / denom
        out[f'{cname}_PQ'] = float(pq)
        pqs.append(pq)
    out['PQ'] = float(np.mean(pqs)) if pqs else 0.0
    return out
