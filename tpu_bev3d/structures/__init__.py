from .boxes3d import (LIDAR, CAM, DEPTH, Boxes3D, LiDARBoxes3D, bev,
                      corners_bev, corners_lidar, flip, in_range_3d,
                      in_range_bev, limit_yaw, points_in_rbbox, rot_mat_z,
                      rotate, scale, translate)
from .sample import DataSample, InstanceData

__all__ = [
    'LIDAR', 'CAM', 'DEPTH', 'Boxes3D', 'LiDARBoxes3D', 'DataSample',
    'InstanceData', 'bev', 'corners_bev', 'corners_lidar', 'flip',
    'in_range_3d', 'in_range_bev', 'limit_yaw', 'points_in_rbbox',
    'rot_mat_z', 'rotate', 'scale', 'translate',
]
