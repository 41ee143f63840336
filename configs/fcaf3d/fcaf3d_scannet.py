# FCAF3D ScanNet (ref config: configs/fcaf3d/fcaf3d_2xb8_scannet-3d-18class.py).
# TPU note: fixed voxel capacity replaces Minkowski dynamic sparsity; the
# anchor-free head and Mink-style backbone match the reference design.
class_names = ['cabinet', 'bed', 'chair', 'sofa', 'table', 'door',
               'window', 'bookshelf', 'picture', 'counter', 'desk',
               'curtain', 'refrigerator', 'showercurtrain', 'toilet',
               'sink', 'bathtub', 'garbagebin']

voxel_size = [0.08, 0.08, 0.08]
point_cloud_range = [-6.4, -6.4, -2.56, 6.4, 6.4, 2.56]

model = dict(
    type='MinkSingleStage3DDetector',
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_voxels=40000,
    backbone=dict(
        type='MinkUNetBackbone', in_channels=6, base_channels=64,
        encoder_channels=[64, 128, 256, 512],
        decoder_channels=[256, 128, 128, 128]),
    bbox_head=dict(
        type='FCAF3DHead',
        num_classes=18,
        in_channels=128,
        voxel_size=voxel_size,
        pc_range=point_cloud_range,
        max_num=256),
)

train_cfg = dict(
    max_epochs=12,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.0001),
    scheduler=dict(type='step', milestones=[8, 11], gamma=0.1),
    clip_grad_norm=10.0,
    batch_size=16,
)

data_root = 'data/scannet/'

# ---- data (ref configs/fcaf3d scannet pipeline) ----
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', load_dim=6,
         use_dim=[0, 1, 2]),
    dict(type='LoadAnnotations3D'),
    dict(type='GlobalAlignment', rotation_axis=2),
    dict(type='PointSample', num_points=100000),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.087266, 0.087266],
         scale_ratio_range=[0.9, 1.1], translation_std=[0.1, 0.1, 0.1]),
    dict(type='Pack3DDetInputs', num_points=100000, max_gt=64),
]
train_dataloader = dict(dataset=dict(
    type='ScanNetDataset', data_root=data_root,
    ann_file='scannet_infos_train.pkl',
    data_prefix=dict(pts='points', pts_semantic_mask='semantic_mask',
                     pts_instance_mask='instance_mask'),
    pipeline=train_pipeline))
