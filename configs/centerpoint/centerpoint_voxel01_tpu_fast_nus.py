# CenterPoint nuScenes — TPU-fast variant: BEVColumnEncoder replaces the
# sparse middle encoder (see second_kitti_3class_tpu_fast.py rationale).
_base_ = './centerpoint_voxel01_second_secfpn_nus.py'

model = dict(
    middle_encoder=dict(
        _delete_=True,
        type='BEVColumnEncoder',
        in_channels=5,
        sparse_shape=[41, 1024, 1024],
        fused_stem=True,
        pack_xy=4,
        stem_channels=128,
        stage_channels=[128, 128, 256],
        stage_strides=[1, 2, 1],
        output_channels=256,
        voxel_size=[0.1, 0.1, 0.2],
        point_cloud_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]),
    backbone=dict(in_channels=256),
)
