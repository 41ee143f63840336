# DfM KITTI (ref: projects/DfM — monocular detection with temporal
# stereo; plane-sweep cost volume to BEV, ref dfm detector).
class_names = ['Pedestrian', 'Cyclist', 'Car']

model = dict(
    type='DfM',
    image_size=(384, 1280),
    num_groups=8,
    xbound=[0.0, 70.4, 0.4], ybound=[-40.0, 40.0, 0.4],
    zbound=[-3.0, 3.0, 6.0], dbound=[2.0, 59.6, 0.8],
    img_backbone=dict(
        type='SwinTransformer', embed_dims=96, depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24], window_size=7, out_indices=[1, 2, 3]),
    img_neck=dict(
        type='GeneralizedLSSFPN', in_channels=[192, 384, 768],
        out_channels=64, num_outs=1),
    backbone=dict(
        type='SECOND', in_channels=64, layer_nums=[5, 5],
        layer_strides=[1, 2], out_channels=[128, 256]),
    neck=dict(
        type='SECONDFPN', in_channels=[128, 256],
        upsample_strides=[1, 2], out_channels=[256, 256]),
    bbox_head=dict(
        type='Anchor3DHead',
        num_classes=3,
        in_channels=512,
        feat_channels=512,
        anchor_generator=dict(
            type='Anchor3DRangeGenerator',
            ranges=[
                [0, -40.0, -0.6, 70.4, 40.0, -0.6],
                [0, -40.0, -0.6, 70.4, 40.0, -0.6],
                [0, -40.0, -1.78, 70.4, 40.0, -1.78],
            ],
            sizes=[[0.8, 0.6, 1.73], [1.76, 0.6, 1.73], [3.9, 1.6, 1.56]],
            rotations=[0, 1.57]),
        assigner_cfgs=[
            dict(pos_iou_thr=0.35, neg_iou_thr=0.2, min_pos_iou=0.2),
            dict(pos_iou_thr=0.35, neg_iou_thr=0.2, min_pos_iou=0.2),
            dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),
        ],
        nms_pre=100, max_num=50),
)

train_cfg = dict(
    max_epochs=60,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.0001),
    scheduler=dict(type='step', milestones=[50, 58], gamma=0.1),
    clip_grad_norm=35.0,
    batch_size=16,
)

data_root = 'data/kitti/'
