# CenterPoint pillar-0.2 nuScenes (ref config:
# configs/centerpoint/centerpoint_pillar02_second_secfpn_8xb4-cyclic-20e_nus-3d.py
# — the pillar-encoder variant, README.md:119 48.70/59.62 mAP/NDS).
_base_ = './centerpoint_voxel01_second_secfpn_nus.py'

voxel_size = [0.2, 0.2, 8]
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]

model = dict(
    voxel_size=voxel_size,
    max_num_points=20,
    max_voxels=30000,
    voxel_encoder=dict(
        _delete_=True,
        type='PillarFeatureNet',
        in_channels=5,
        feat_channels=[64],
        with_distance=False,
        voxel_size=voxel_size,
        point_cloud_range=point_cloud_range),
    middle_encoder=dict(
        _delete_=True,
        type='PointPillarsScatter', in_channels=64,
        output_shape=[512, 512]),
    backbone=dict(
        _delete_=True,
        type='SECOND', in_channels=64, layer_nums=[3, 5, 5],
        layer_strides=[2, 2, 2], out_channels=[64, 128, 256]),
    neck=dict(
        _delete_=True,
        type='SECONDFPN', in_channels=[64, 128, 256],
        upsample_strides=[0.5, 1, 2], out_channels=[128, 128, 128]),
    bbox_head=dict(in_channels=384),
)
