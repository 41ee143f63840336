# SECOND KITTI — TPU-fast variant: the sparse middle encoder's random-row
# gathers are the TPU anti-pattern (347 ms/frame measured); the
# BEVColumnEncoder (z-to-channels packed columns + 2D MXU convs, the
# flagship's encoder) replaces it. Same BEV resolution out (1600/8 x
# 1408/8), anchors/head unchanged.
_base_ = './second_kitti_3class.py'

model = dict(
    middle_encoder=dict(
        _delete_=True,
        type='BEVColumnEncoder',
        in_channels=4,
        sparse_shape=[41, 1600, 1408],
        fused_stem=True,
        pack_xy=4,
        stem_channels=128,
        stage_channels=[128, 128, 256],
        stage_strides=[1, 2, 1],
        output_channels=256,
        voxel_size=[0.05, 0.05, 0.1],
        point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
    backbone=dict(in_channels=256),
)
