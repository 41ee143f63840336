from .nuscenes_metric import NuScenesMetric
from .kitti_metric import KittiMetric, WaymoMetric
from .seg_metric import SegMetric

__all__ = ['NuScenesMetric', 'KittiMetric', 'WaymoMetric', 'SegMetric']
