from .metrics.nuscenes_metric import (NuScenesMetric, LyftMetric,
                                      IndoorMetric, InstanceSegMetric,
                                      PanopticSegMetric)
from .metrics.kitti_metric import KittiMetric, WaymoMetric
from .metrics.seg_metric import SegMetric

__all__ = ['NuScenesMetric', 'LyftMetric', 'IndoorMetric',
           'InstanceSegMetric', 'PanopticSegMetric', 'KittiMetric',
           'WaymoMetric', 'SegMetric']
