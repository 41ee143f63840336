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
class WaymoMetric(KittiMetric):
    """Waymo eval via the KITTI-style AP backend over Waymo classes
    (ref: mmdet3d/evaluation/metrics/waymo_metric.py converts to
    KITTI-format and reuses the same rotated-IoU AP machinery)."""

    def __init__(self, classes: Sequence[str] = (), **kwargs):
        super().__init__(classes=list(classes)
                         or ['Car', 'Pedestrian', 'Cyclist'], **kwargs)
