from .metrics.nuscenes_metric import NuScenesMetric
from .metrics.kitti_metric import KittiMetric
from .metrics.seg_metric import SegMetric

__all__ = ['NuScenesMetric', 'KittiMetric', 'SegMetric']
