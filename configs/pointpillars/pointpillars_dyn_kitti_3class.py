# Dynamic-voxelization PointPillars KITTI 3-class.
# Ref config: configs/dynamic_voxelization/pointpillars_dv_secfpn_8xb6-160e_kitti-3d-car.py (3-class variant)
_base_ = './pointpillars_kitti_3class.py'

model = dict(
    type='DynamicVoxelNet',
    voxel_encoder=dict(
        _delete_=True,
        type='DynamicVFE',
        in_channels=4,
        feat_channels=[64],
        with_cluster_center=True,
        with_voxel_center=True,
        voxel_size=[0.16, 0.16, 4],
        point_cloud_range=[0, -39.68, -3, 69.12, 39.68, 1]),
)
