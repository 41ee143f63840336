# SMOKE KITTI monocular (ref config:
# configs/smoke/smoke_dla34_dlaneck_gn-all_8xb4-6x_kitti-mono3d.py).
class_names = ['Pedestrian', 'Cyclist', 'Car']

model = dict(
    type='SMOKEMono3D',
    img_backbone=dict(type='DLA', levels=(1, 1, 1, 2, 2, 1),
                      channels=(16, 32, 64, 128, 256, 512),
                      out_indices=(2, 3, 4, 5)),
    img_neck=dict(type='GeneralizedLSSFPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=1),
    bbox_head=dict(
        type='SMOKEMono3DHead',
        num_classes=3,
        in_channels=64,
        feat_channels=64,
        stride=4,
        max_num=100),
)

train_cfg = dict(
    max_epochs=72,
    optimizer=dict(type='adamw', lr=0.00025, weight_decay=0.0001),
    scheduler=dict(type='step', milestones=[50], gamma=0.1),
    clip_grad_norm=35.0,
    batch_size=32,
)

data_root = 'data/kitti/'
# ---- data (ref config train/test pipelines:
# configs/smoke/smoke_dla34_dlaneck_gn-all_4xb8-6x_kitti-mono3d.py:8-32) ----
train_pipeline = [
    dict(type='LoadImageFromFileMono3D'),
    dict(type='RandomShiftScale', shift_scale=(0.2, 0.4), aug_prob=0.3),
    dict(type='AffineResize', img_scale=(1280, 384), down_ratio=4),
    dict(type='Pack3DDetInputs', max_gt=32),
]
test_pipeline = [
    dict(type='LoadImageFromFileMono3D'),
    dict(type='AffineResize', img_scale=(1280, 384), down_ratio=4),
    dict(type='Pack3DDetInputs', max_gt=32),
]
train_dataloader = dict(dataset=dict(
    type='KittiDataset', data_root=data_root,
    modality=dict(use_lidar=False, use_camera=True),
    ann_file='kitti_infos_train.pkl', pipeline=train_pipeline))
test_dataloader = dict(dataset=dict(
    type='KittiDataset', data_root=data_root,
    modality=dict(use_lidar=False, use_camera=True),
    ann_file='kitti_infos_val.pkl', pipeline=test_pipeline,
    test_mode=True))
