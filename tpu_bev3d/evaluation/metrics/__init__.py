from .nuscenes_metric import NuScenesMetric
from .kitti_metric import KittiMetric

__all__ = ['NuScenesMetric', 'KittiMetric']
