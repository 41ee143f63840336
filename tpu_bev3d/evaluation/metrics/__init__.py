from .nuscenes_metric import NuScenesMetric, LyftMetric
from .kitti_metric import KittiMetric, WaymoMetric
from .seg_metric import SegMetric

__all__ = ['NuScenesMetric', 'LyftMetric', 'KittiMetric', 'WaymoMetric',
           'SegMetric']
