# Dynamic-voxelization SECOND KITTI (ref config:
# configs/dynamic_voxelization/second_dv_secfpn_8xb2-cosine-80e_kitti-3d-3class.py).
_base_ = '../second/second_kitti_3class.py'

model = dict(
    type='DynamicVoxelNet',
    voxel_encoder=dict(
        _delete_=True,
        type='DynamicVFE',
        in_channels=4,
        feat_channels=[64, 128],
        with_distance=False,
        voxel_size=[0.05, 0.05, 0.1],
        point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
    middle_encoder=dict(in_channels=128),
)
