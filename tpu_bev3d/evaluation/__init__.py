from .metrics.nuscenes_metric import NuScenesMetric
from .metrics.kitti_metric import KittiMetric

__all__ = ['NuScenesMetric', 'KittiMetric']
