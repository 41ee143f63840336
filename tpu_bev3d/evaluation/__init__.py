from .metrics.nuscenes_metric import NuScenesMetric
from .metrics.kitti_metric import KittiMetric, WaymoMetric
from .metrics.seg_metric import SegMetric

__all__ = ['NuScenesMetric', 'KittiMetric', 'WaymoMetric', 'SegMetric']
