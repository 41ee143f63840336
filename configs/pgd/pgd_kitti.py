# PGD KITTI monocular (ref config:
# configs/pgd/pgd_r101-caffe_fpn_head-gn_4xb3-4x_kitti-mono3d.py).
# PGDHead adds depth uncertainty + geometric depth propagation over the
# FCOS3D base (ref pgd_head.py:1-1239).
class_names = ['Pedestrian', 'Cyclist', 'Car']

model = dict(
    type='FCOSMono3D',
    img_backbone=dict(
        type='SwinTransformer', embed_dims=96, depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24], window_size=7, out_indices=[1, 2, 3]),
    img_neck=dict(
        type='GeneralizedLSSFPN', in_channels=[192, 384, 768],
        out_channels=256, num_outs=3),
    bbox_head=dict(
        type='PGDHead',
        num_classes=3,
        in_channels=256,
        feat_channels=256,
        stacked_convs=2,
        strides=[4, 8, 16],
        num_depth_bins=8,
        depth_range=(0.1, 70.0),
        max_num=100),
)

train_cfg = dict(
    max_epochs=48,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.0001),
    scheduler=dict(type='step', milestones=[32, 44], gamma=0.1),
    clip_grad_norm=35.0,
    batch_size=12,
)

data_root = 'data/kitti/'
