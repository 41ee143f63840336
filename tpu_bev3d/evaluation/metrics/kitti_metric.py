"""KITTI metric (ref: mmdet3d/evaluation/metrics/kitti_metric.py — format
to KITTI and run kitti_utils.eval; here the native numpy evaluator)."""
from __future__ import annotations

from typing import Dict, Sequence

from ...registry import METRICS
from ..functional.kitti_eval import kitti_eval
from .base_metric import BaseMetric


@METRICS.register_module()
class KittiMetric(BaseMetric):
    def __init__(self, classes: Sequence[str] = (), metric: str = 'bbox',
                 **kwargs):
        super().__init__(**kwargs)
        self.classes = list(classes) or ['Pedestrian', 'Cyclist', 'Car']

    def compute_metrics(self) -> Dict[str, float]:
        preds = [r[0] for r in self.results]
        gts = [r[1] for r in self.results]
        return kitti_eval(preds, gts, self.classes)


@METRICS.register_module()
class WaymoMetric(BaseMetric):
    """Native Waymo protocol: LEVEL_1/2 mAP + mAPH, optional LET variants
    (ref: mmdet3d/evaluation/metrics/waymo_metric.py:246 delegating to the
    waymo-open-dataset metrics; here evaluation/functional/waymo_eval.py).
    """

    def __init__(self, classes: Sequence[str] = (), let: bool = False,
                 **kwargs):
        super().__init__(**kwargs)
        self.classes = list(classes) or ['Car', 'Pedestrian', 'Cyclist']
        self.let = let

    def compute_metrics(self) -> Dict[str, float]:
        from ..functional.waymo_eval import waymo_eval
        preds = [r[0] for r in self.results]
        gts = [r[1] for r in self.results]
        out = waymo_eval(preds, gts, self.classes)
        if self.let:
            out.update(waymo_eval(preds, gts, self.classes, let=True))
        return out
