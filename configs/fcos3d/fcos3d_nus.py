# FCOS3D nuScenes monocular (ref config:
# configs/fcos3d/fcos3d_r101-caffe-dcn_fpn_head-gn_8xb2-1x_nus-mono3d.py).
# TPU stack substitution: Swin-T backbone + LSS-FPN replaces the
# reference's ResNet101-DCN + FPN (DCN has no MXU-friendly analogue;
# documented deviation).
class_names = [
    'car', 'truck', 'trailer', 'bus', 'construction_vehicle', 'bicycle',
    'motorcycle', 'pedestrian', 'traffic_cone', 'barrier'
]

model = dict(
    type='FCOSMono3D',
    img_backbone=dict(
        type='SwinTransformer', embed_dims=96, depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24], window_size=7, out_indices=[1, 2, 3]),
    img_neck=dict(
        type='GeneralizedLSSFPN', in_channels=[192, 384, 768],
        out_channels=256, num_outs=3),
    bbox_head=dict(
        type='FCOSMono3DHead',
        num_classes=10,
        in_channels=256,
        feat_channels=256,
        stacked_convs=2,
        strides=[8, 16, 32],
        max_num=200),
)

train_cfg = dict(
    max_epochs=12,
    optimizer=dict(type='adamw', lr=0.002, weight_decay=0.0001),
    scheduler=dict(type='step', milestones=[8, 11], gamma=0.1),
    clip_grad_norm=35.0,
    batch_size=16,
)

data_root = 'data/nuscenes/'
