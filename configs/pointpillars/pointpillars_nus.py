# PointPillars SECFPN nuScenes (ref: configs/pointpillars/
#   pointpillars_hv_secfpn_sbn-all_8xb4-2x_nus-3d.py)
voxel_size = [0.25, 0.25, 8]
point_cloud_range = [-50, -50, -5, 50, 50, 3]
class_names = [
    'car', 'truck', 'trailer', 'bus', 'construction_vehicle', 'bicycle',
    'motorcycle', 'pedestrian', 'traffic_cone', 'barrier'
]

model = dict(
    type='VoxelNet',
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_num_points=64,
    max_voxels=30000,
    voxel_encoder=dict(
        type='PillarFeatureNet',
        in_channels=4,
        feat_channels=[64],
        with_distance=False,
        voxel_size=voxel_size,
        point_cloud_range=point_cloud_range),
    middle_encoder=dict(
        type='PointPillarsScatter', in_channels=64, output_shape=[400, 400]),
    backbone=dict(
        type='SECOND',
        in_channels=64,
        layer_nums=[3, 5, 5],
        layer_strides=[2, 2, 2],
        out_channels=[64, 128, 256]),
    neck=dict(
        type='SECONDFPN',
        in_channels=[64, 128, 256],
        upsample_strides=[1, 2, 4],
        out_channels=[128, 128, 128]),
    bbox_head=dict(
        type='Anchor3DHead',
        num_classes=10,
        in_channels=384,
        feat_channels=384,
        use_direction_classifier=True,
        box_code_size=9,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[[-49.6, -49.6, -1.80, 49.6, 49.6, -1.80]],
            sizes=[[4.60718145, 1.95017717, 1.72270761]],
            rotations=[0, 1.57],
            size_per_range=False),
        assigner_cfgs=[dict(pos_iou_thr=0.6, neg_iou_thr=0.3,
                            min_pos_iou=0.3)] * 10,
        diff_rad_by_sin=True,
        nms_pre=1024,
        score_thr=0.05,
        nms_iou_thr=0.2,
        max_num=500),
)

train_cfg = dict(
    max_epochs=24,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.01),
    scheduler=dict(type='step', milestones=[20, 23], gamma=0.1),
    clip_grad_norm=35.0,
    batch_size=4,
)
