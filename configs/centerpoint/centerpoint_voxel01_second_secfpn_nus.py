# CenterPoint voxel 0.1 SECFPN nuScenes.
# Ref config: configs/centerpoint/centerpoint_voxel01_second_secfpn_8xb4-cyclic-20e_nus-3d.py
voxel_size = [0.1, 0.1, 0.2]
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
class_names = [
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone'
]

model = dict(
    type='CenterPoint',
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_num_points=10,
    max_voxels=90000,
    voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
    middle_encoder=dict(
        type='SparseEncoder',
        in_channels=5,
        sparse_shape=[41, 1024, 1024],
        base_channels=16,
        output_channels=128,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0)),
        # block-sparse tile backend, exact spconv active-set rule — also
        # sidesteps the r2 known issue (flat sparse graph inside lax.scan
        # faulted the remote TPU worker)
        backend='tile',
        tile_shape=(2, 4, 4),
        tile_capacity=16384,
        tile_stage_factor=0.5,
        tile_dtype='bfloat16',
        active_rule='spconv',
        conv_out_kernel=(3, 1, 1),
        conv_out_stride=(2, 1, 1)),
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
        type='CenterHead',
        in_channels=512,
        tasks=[
            dict(num_class=1, class_names=['car']),
            dict(num_class=2, class_names=['truck', 'construction_vehicle']),
            dict(num_class=2, class_names=['bus', 'trailer']),
            dict(num_class=1, class_names=['barrier']),
            dict(num_class=2, class_names=['motorcycle', 'bicycle']),
            dict(num_class=2, class_names=['pedestrian', 'traffic_cone']),
        ],
        share_conv_channel=64,
        grid_size=[1024, 1024],
        voxel_size=voxel_size,
        point_cloud_range=point_cloud_range,
        out_size_factor=8,
        gaussian_overlap=0.1,
        min_radius=2,
        code_weights=[1., 1., 1., 1., 1., 1., 1., 1., 0.2, 0.2],
        max_objs=100,
        with_velocity=True,
        nms_type='circle',
        min_radius_by_task=[4, 12, 10, 1, 0.85, 0.175],
        post_max_size=83),
)

train_cfg = dict(
    max_epochs=20,
    optimizer=dict(type='adamw', lr=1e-4, weight_decay=0.01),
    scheduler=dict(type='cyclic', target_ratio=(10, 1e-4)),
    clip_grad_norm=35.0,
    batch_size=4,
)

# ---- data (ref cyclic-20e nuScenes recipe; expects
# tools/nuscenes_converter.py output) ----
data_root = 'data/nuscenes/'
train_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=9, load_dim=5,
         use_dim=[0, 1, 2, 3], pad_empty_sweeps=True, remove_close=True),
    dict(type='LoadAnnotations3D'),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.78539816, 0.78539816],
         scale_ratio_range=[0.95, 1.05], translation_std=[0.5, 0.5, 0.5]),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
    dict(type='Pack3DDetInputs', num_points=120000, max_gt=128, box_dim=9),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=9, load_dim=5,
         use_dim=[0, 1, 2, 3], pad_empty_sweeps=True, remove_close=True,
         test_mode=True),
    dict(type='LoadAnnotations3D'),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='Pack3DDetInputs', num_points=120000, max_gt=128, box_dim=9),
]
train_dataloader = dict(dataset=dict(
    type='CBGSDataset',
    dataset=dict(type='NuScenesDataset', data_root=data_root,
                 ann_file='nuscenes_infos.pkl', pipeline=train_pipeline)))
test_dataloader = dict(dataset=dict(
    type='NuScenesDataset', data_root=data_root,
    ann_file='nuscenes_infos.pkl', pipeline=test_pipeline,
    test_mode=False))
test_evaluator = dict(type='NuScenesMetric', classes=class_names)
