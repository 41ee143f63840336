from .nuscenes_eval import nuscenes_eval
from .kitti_eval import kitti_eval
from .waymo_eval import waymo_eval
from .lyft_eval import lyft_eval
from .indoor_eval import (indoor_eval, instance_seg_eval,
                          panoptic_seg_eval)

__all__ = ['nuscenes_eval', 'kitti_eval', 'waymo_eval', 'lyft_eval', 'indoor_eval', 'instance_seg_eval', 'panoptic_seg_eval']
