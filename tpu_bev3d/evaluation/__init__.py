from .metrics.nuscenes_metric import NuScenesMetric, LyftMetric
from .metrics.kitti_metric import KittiMetric, WaymoMetric
from .metrics.seg_metric import SegMetric

__all__ = ['NuScenesMetric', 'LyftMetric', 'KittiMetric', 'WaymoMetric',
           'SegMetric']
