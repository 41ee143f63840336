# PV-RCNN KITTI (ref: configs/pv_rcnn/pv_rcnn_8xb2-80e_kitti-3d-3class.py)
voxel_size = [0.05, 0.05, 0.1]
point_cloud_range = [0, -40, -3, 70.4, 40, 1]
class_names = ['Pedestrian', 'Cyclist', 'Car']

model = dict(
    type='PVRCNN',
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_num_points=5,
    max_voxels=16000,
    voxel_encoder=dict(type='HardSimpleVFE'),
    middle_encoder=dict(
        type='SparseEncoder',
        in_channels=4,
        sparse_shape=[41, 1600, 1408],
        base_channels=16,
        output_channels=128,
        encoder_channels=[[16], [32, 32, 32], [64, 64, 64], [64, 64, 64]],
        encoder_paddings=[[1], [1, 1, 1], [1, 1, 1], [[0, 1, 1], 1, 1]],
        stage_capacity_factor=0.6,
        return_middle_feats=True),
    backbone=dict(
        type='SECOND',
        in_channels=256,
        layer_nums=[5, 5],
        layer_strides=[1, 2],
        out_channels=[128, 256]),
    neck=dict(
        type='SECONDFPN',
        in_channels=[128, 256],
        upsample_strides=[1, 2],
        out_channels=[256, 256]),
    rpn_head=dict(
        type='Anchor3DHead',
        num_classes=3,
        in_channels=512,
        feat_channels=512,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='Anchor3DRangeGenerator',
            ranges=[[0, -40.0, -0.6, 70.4, 40.0, -0.6],
                    [0, -40.0, -0.6, 70.4, 40.0, -0.6],
                    [0, -40.0, -1.78, 70.4, 40.0, -1.78]],
            sizes=[[0.8, 0.6, 1.73], [1.76, 0.6, 1.73], [3.9, 1.6, 1.56]],
            rotations=[0, 1.57]),
        assigner_cfgs=[
            dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
            dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
            dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45)],
        nms_pre=512,
        score_thr=0.05,
        nms_iou_thr=0.8,
        max_num=128),
    points_encoder=dict(
        type='VoxelSetAbstraction',
        num_keypoints=2048,
        point_cloud_range=point_cloud_range,
        voxel_size=voxel_size),
    roi_head=dict(
        type='PVRCNNRoIHead',
        grid_size=6),
)

train_cfg = dict(
    max_epochs=80,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.01),
    scheduler=dict(type='cosine', warmup_steps=500),
    clip_grad_norm=10.0,
    batch_size=2,
)
