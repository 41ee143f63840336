from .nuscenes_eval import nuscenes_eval
from .kitti_eval import kitti_eval

__all__ = ['nuscenes_eval', 'kitti_eval']
