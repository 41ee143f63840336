"""Semantic segmentation metric: mIoU / per-class IoU / overall acc
(ref: mmdet3d/evaluation/metrics/seg_metric.py + functional/seg_eval.py)."""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from ...registry import METRICS


@METRICS.register_module()
class SegMetric:
    def __init__(self, classes: Sequence[str] = (), ignore_index: int = 255,
                 **kw):
        self.classes = list(classes)
        self.ignore_index = ignore_index
        self.reset()

    def reset(self):
        n = max(len(self.classes), 1)
        self.confusion = np.zeros((n, n), np.int64)

    def process(self, predictions: dict, batch: dict):
        pred = np.asarray(predictions['pts_semantic_mask'])
        gt = np.asarray(batch['pts_semantic_mask'])
        mask = np.asarray(predictions.get(
            'mask', np.ones_like(gt, bool))) & (gt != self.ignore_index)
        n = self.confusion.shape[0]
        p = pred[mask].reshape(-1)
        g = gt[mask].reshape(-1)
        np.add.at(self.confusion, (g, np.clip(p, 0, n - 1)), 1)

    def compute_metrics(self) -> Dict[str, float]:
        c = self.confusion
        tp = np.diag(c).astype(np.float64)
        denom = c.sum(0) + c.sum(1) - tp
        iou = np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)
        out = {f'iou_{name}': float(iou[i])
               for i, name in enumerate(self.classes)}
        out['miou'] = float(np.nanmean(iou)) if np.isfinite(
            np.nansum(iou)) else 0.0
        out['acc'] = float(tp.sum() / max(c.sum(), 1))
        return out
