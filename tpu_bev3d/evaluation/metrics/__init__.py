from .nuscenes_metric import (NuScenesMetric, LyftMetric, IndoorMetric,
                              InstanceSegMetric, PanopticSegMetric)
from .kitti_metric import KittiMetric, WaymoMetric
from .seg_metric import SegMetric

__all__ = ['NuScenesMetric', 'LyftMetric', 'IndoorMetric',
           'InstanceSegMetric', 'PanopticSegMetric', 'KittiMetric',
           'WaymoMetric', 'SegMetric']
