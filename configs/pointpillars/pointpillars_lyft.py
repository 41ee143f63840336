# PointPillars Lyft (ref config:
# configs/pointpillars/pointpillars_hv_fpn_sbn-all_8xb2-2x_lyft-3d.py —
# 9 classes, no velocity).
voxel_size = [0.25, 0.25, 8]
point_cloud_range = [-80, -80, -5, 80, 80, 3]
class_names = [
    'car', 'truck', 'bus', 'emergency_vehicle', 'other_vehicle',
    'motorcycle', 'bicycle', 'pedestrian', 'animal'
]

model = dict(
    type='VoxelNet',
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_num_points=20,
    max_voxels=60000,
    voxel_encoder=dict(
        type='PillarFeatureNet', in_channels=5, feat_channels=[64],
        with_distance=False, voxel_size=voxel_size,
        point_cloud_range=point_cloud_range),
    middle_encoder=dict(
        type='PointPillarsScatter', in_channels=64,
        output_shape=[640, 640]),
    backbone=dict(
        type='SECOND', in_channels=64, layer_nums=[3, 5, 5],
        layer_strides=[2, 2, 2], out_channels=[64, 128, 256]),
    neck=dict(
        type='SECONDFPN', in_channels=[64, 128, 256],
        upsample_strides=[1, 2, 4], out_channels=[128, 128, 128]),
    bbox_head=dict(
        type='Anchor3DHead',
        num_classes=9,
        in_channels=384,
        feat_channels=384,
        box_code_size=7,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[[-80, -80, -1.8, 80, 80, -1.8]],
            sizes=[[4.75, 1.92, 1.71], [10.24, 2.84, 3.44],
                   [12.70, 2.92, 3.42], [6.52, 2.42, 2.34],
                   [8.17, 2.75, 3.20], [2.35, 0.96, 1.59],
                   [1.76, 0.63, 1.44], [0.80, 0.76, 1.76],
                   [0.73, 0.35, 0.50]],
            rotations=[0, 1.57]),
        assigner_cfgs=[dict(pos_iou_thr=0.6, neg_iou_thr=0.45,
                            min_pos_iou=0.45)] * 9,
        nms_pre=1000, max_num=500),
)

train_cfg = dict(
    max_epochs=24,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.01),
    scheduler=dict(type='step', milestones=[20, 23], gamma=0.1),
    clip_grad_norm=35.0,
    batch_size=16,
)

data_root = 'data/lyft/'
