# BEVFusion LiDAR-only, nuScenes (voxel 0.075).
# Ref config: projects/BEVFusion/configs/nuscenes/
#   bevfusion_lidar_voxel0075_second_secfpn_8xb4-cyclic-20e_nus-3d.py
voxel_size = [0.075, 0.075, 0.2]
point_cloud_range = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
class_names = [
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone'
]

model = dict(
    type='BEVFusion',
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_num_points=10,
    max_voxels=120000,
    middle_encoder=dict(
        type='BEVFusionSparseEncoder',
        in_channels=5,
        sparse_shape=[41, 1440, 1440],
        base_channels=16,
        output_channels=128,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0)),
        conv_out_kernel=(3, 1, 1),
        conv_out_stride=(2, 1, 1),
        # block-sparse tile backend, exact spconv active-set rule
        # (ops/tile_sparse.py) — the TPU performance class for the
        # reference-faithful sparse encoder
        backend='tile',
        tile_shape=(2, 4, 4),
        # Explicit per-stage capacities (10-sweep train provisioning).
        # The exact spconv rule DILATES the active tile set at the
        # first stride-2 downsample (measured keyframe demand
        # 7487 -> 8695 -> 5225 -> 2202, tools/probe_tile_occupancy.py),
        # so a monotone shrink schedule under-provisions stages 1-2:
        # the old 20480 x0.5 march (20480/10240/5120/2560) sat BELOW
        # keyframe demand at stage 2 (5120 < 5225). Stage-0 provision
        # stays 20480 (10-sweep headroom); deeper stages follow the
        # measured dilation shape (x1.16 / x0.60 / x0.42).
        tile_capacities=[20480, 23784, 14296, 6024],
        tile_dtype='bfloat16',
        active_rule='spconv'),
    backbone=dict(
        type='SECOND',
        in_channels=256,
        out_channels=[128, 256],
        layer_nums=[5, 5],
        layer_strides=[1, 2]),
    neck=dict(
        type='SECONDFPN',
        in_channels=[128, 256],
        out_channels=[256, 256],
        upsample_strides=[1, 2]),
    bbox_head=dict(
        type='BEVFusionHead',
        num_classes=10,
        in_channels=512,
        hidden_channel=128,
        num_proposals=200,
        num_heads=8,
        ffn_channel=256,
        nms_kernel_size=3,
        point_cloud_range=point_cloud_range,
        voxel_size=voxel_size,
        out_size_factor=8,
        code_size=10,
        with_velocity=True),
)

train_cfg = dict(
    max_epochs=20,
    optimizer=dict(type='adamw', lr=1e-4, weight_decay=0.01),
    scheduler=dict(type='cyclic', target_ratio=(10, 1e-4),
                   step_ratio_up=0.4),
    clip_grad_norm=35.0,
    batch_size=4,
)
