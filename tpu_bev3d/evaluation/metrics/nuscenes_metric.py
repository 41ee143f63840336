"""nuScenes metric (ref: mmdet3d/evaluation/metrics/nuscenes_metric.py:24 —
process:125 per-sample collection, compute_metrics:149 → NDS/mAP; here the
devkit call is replaced by the native evaluator in
functional/nuscenes_eval.py, following the pkl-ann-based design of the
BEVFusion project's NuScenesCustomMetric:185)."""
from __future__ import annotations

from typing import Dict, Sequence

from ...registry import METRICS
from ..functional.nuscenes_eval import nuscenes_eval
from .base_metric import BaseMetric


@METRICS.register_module()
class NuScenesMetric(BaseMetric):
    def __init__(self, classes: Sequence[str] = (), metric: str = 'bbox',
                 **kwargs):
        super().__init__(**kwargs)
        self.classes = list(classes) or [
            'car', 'truck', 'construction_vehicle', 'bus', 'trailer',
            'barrier', 'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone']

    def compute_metrics(self) -> Dict[str, float]:
        preds = [r[0] for r in self.results]
        gts = [r[1] for r in self.results]
        return nuscenes_eval(preds, gts, self.classes)


@METRICS.register_module()
class LyftMetric(BaseMetric):
    """Native Lyft protocol: mAP over 3D-IoU thresholds 0.5..0.95 (ref
    mmdet3d/evaluation/metrics/lyft_metric.py via lyft_dataset_sdk; here
    evaluation/functional/lyft_eval.py)."""

    def __init__(self, classes=(), **kwargs):
        super().__init__(**kwargs)
        self.classes = list(classes) or [
            'car', 'truck', 'bus', 'emergency_vehicle', 'other_vehicle',
            'motorcycle', 'bicycle', 'pedestrian', 'animal']

    def compute_metrics(self):
        from ..functional.lyft_eval import lyft_eval
        preds = [r[0] for r in self.results]
        gts = [r[1] for r in self.results]
        return lyft_eval(preds, gts, self.classes)


@METRICS.register_module()
class IndoorMetric(BaseMetric):
    """Indoor AP@0.25/0.5 (ref mmdet3d/evaluation/metrics/
    indoor_metric.py via indoor_eval)."""

    def __init__(self, classes=(), iou_thrs=(0.25, 0.5), **kwargs):
        super().__init__(**kwargs)
        self.classes = list(classes)
        self.iou_thrs = tuple(iou_thrs)

    def compute_metrics(self):
        from ..functional.indoor_eval import indoor_eval
        preds = [r[0] for r in self.results]
        gts = [r[1] for r in self.results]
        return indoor_eval(preds, gts, self.classes, self.iou_thrs)


@METRICS.register_module()
class InstanceSegMetric(BaseMetric):
    """ScanNet-protocol instance-seg AP (ref instance_seg_metric.py)."""

    def __init__(self, classes=(), **kwargs):
        super().__init__(**kwargs)
        self.classes = list(classes)

    def compute_metrics(self):
        from ..functional.indoor_eval import instance_seg_eval
        preds = [r[0] for r in self.results]
        gts = [r[1] for r in self.results]
        return instance_seg_eval(preds, gts, self.classes)


@METRICS.register_module()
class PanopticSegMetric(BaseMetric):
    """Panoptic quality (ref panoptic_seg_metric.py)."""

    def __init__(self, classes=(), **kwargs):
        super().__init__(**kwargs)
        self.classes = list(classes)

    def compute_metrics(self):
        from ..functional.indoor_eval import panoptic_seg_eval
        preds = [r[0] for r in self.results]
        gts = [r[1] for r in self.results]
        return panoptic_seg_eval(preds, gts, self.classes)

