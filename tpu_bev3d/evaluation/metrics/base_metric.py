"""Metric base with the mmengine process/compute split (ref: mmengine
BaseMetric as used by mmdet3d/evaluation/metrics/*). Per-shard accumulate →
host-0 reduce maps onto multi-host eval (SURVEY §2.5)."""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np


class BaseMetric:
    def __init__(self, **kwargs):
        self.results: List[Any] = []

    def reset(self):
        self.results = []

    def process(self, predictions: dict, batch: dict):
        """Accumulate one device batch of fixed-shape predictions + the host
        batch (with metainfo). Override ``process_sample``."""
        preds = {k: np.asarray(v) for k, v in predictions.items()}
        B = preds['bboxes'].shape[0]
        for b in range(B):
            mask = preds['mask'][b]
            sample_pred = dict(
                boxes=preds['bboxes'][b][mask],
                scores=preds['scores'][b][mask],
                labels=preds['labels'][b][mask])
            gt_mask = np.asarray(batch['gt_mask'][b])
            sample_gt = dict(
                boxes=np.asarray(batch['gt_bboxes_3d'][b])[gt_mask],
                labels=np.asarray(batch['gt_labels_3d'][b])[gt_mask])
            meta = batch.get('metainfo', [{}] * B)[b] \
                if isinstance(batch.get('metainfo'), list) else {}
            self.results.append((sample_pred, sample_gt, meta))

    def compute_metrics(self) -> Dict[str, float]:
        raise NotImplementedError
