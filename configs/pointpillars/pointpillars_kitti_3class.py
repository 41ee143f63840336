# PointPillars SECFPN KITTI 3-class.
# Ref config: configs/pointpillars/pointpillars_hv_secfpn_8xb6-160e_kitti-3d-3class.py
voxel_size = [0.16, 0.16, 4]
point_cloud_range = [0, -39.68, -3, 69.12, 39.68, 1]
class_names = ['Pedestrian', 'Cyclist', 'Car']

model = dict(
    type='VoxelNet',
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_num_points=32,
    max_voxels=16000,
    voxel_encoder=dict(
        type='PillarFeatureNet',
        in_channels=4,
        feat_channels=[64],
        with_distance=False,
        voxel_size=voxel_size,
        point_cloud_range=point_cloud_range),
    middle_encoder=dict(
        type='PointPillarsScatter', in_channels=64, output_shape=[496, 432]),
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
        num_classes=3,
        in_channels=384,
        feat_channels=384,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[
                [0, -39.68, -0.6, 69.12, 39.68, -0.6],
                [0, -39.68, -0.6, 69.12, 39.68, -0.6],
                [0, -39.68, -1.78, 69.12, 39.68, -1.78],
            ],
            sizes=[[0.8, 0.6, 1.73], [1.76, 0.6, 1.73], [3.9, 1.6, 1.56]],
            rotations=[0, 1.57]),
        assigner_cfgs=[
            dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
            dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
            dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),
        ],
        diff_rad_by_sin=True,
        nms_pre=512,
        score_thr=0.1,
        nms_iou_thr=0.01,
        max_num=50),
)

train_cfg = dict(
    max_epochs=160,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.01,
                   betas=(0.95, 0.99)),
    scheduler=dict(type='cyclic', target_ratio=(10, 1e-4),
                   cyclic_times=1, step_ratio_up=0.4),
    clip_grad_norm=35.0,
    batch_size=6,
)

# ---- data (ref config train/test pipelines; expects tools/create_data.py
# outputs under data_root) ----
data_root = 'data/kitti/'
train_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
    dict(type='LoadAnnotations3D'),
    dict(type='ObjectSample', db_sampler=dict(
        info_path='dbinfos_train.pkl', data_root=data_root, rate=1.0,
        prepare=dict(filter_by_min_points=dict(Car=5, Pedestrian=5,
                                               Cyclist=5)),
        sample_groups=dict(Car=15, Pedestrian=15, Cyclist=15),
        classes=class_names)),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.78539816, 0.78539816],
         scale_ratio_range=[0.95, 1.05]),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
    dict(type='Pack3DDetInputs', num_points=40000, max_gt=64),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
    dict(type='LoadAnnotations3D'),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='Pack3DDetInputs', num_points=40000, max_gt=64),
]
train_dataloader = dict(dataset=dict(
    type='KittiDataset', data_root=data_root,
    ann_file='kitti_infos_training.pkl', pipeline=train_pipeline))
test_dataloader = dict(dataset=dict(
    type='KittiDataset', data_root=data_root,
    ann_file='kitti_infos_training.pkl', pipeline=test_pipeline,
    test_mode=False))
test_evaluator = dict(type='KittiMetric', classes=class_names)
custom_hooks = [dict(type='DisableObjectSampleHook',
                     disable_after_epoch=15)]
