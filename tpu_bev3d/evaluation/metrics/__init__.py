from .nuscenes_metric import NuScenesMetric
from .kitti_metric import KittiMetric
from .seg_metric import SegMetric

__all__ = ['NuScenesMetric', 'KittiMetric', 'SegMetric']
