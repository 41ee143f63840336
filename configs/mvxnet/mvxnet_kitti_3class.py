# MVX-Net KITTI 3-class (ref config:
# configs/mvxnet/mvxnet_fpn_dv_second_secfpn_8xb2-80e_kitti-3d-3class.py).
voxel_size = [0.05, 0.05, 0.1]
point_cloud_range = [0, -40, -3, 70.4, 40, 1]
class_names = ['Pedestrian', 'Cyclist', 'Car']

model = dict(
    type='MVXNet',
    image_size=[384, 1280],
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_voxels=40000,
    img_backbone=dict(
        type='SwinTransformer', embed_dims=96, depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24], window_size=7, out_indices=[1, 2, 3]),
    img_neck=dict(
        type='GeneralizedLSSFPN', in_channels=[192, 384, 768],
        out_channels=256, num_outs=1),
    fusion_layer=dict(type='PointFusion', img_channels=256,
                      out_channels=128, image_size=[384, 1280]),
    voxel_encoder=dict(
        type='DynamicVFE', in_channels=128 + 4, feat_channels=[64, 64],
        with_distance=False, voxel_size=voxel_size,
        point_cloud_range=point_cloud_range),
    middle_encoder=dict(
        type='SparseEncoder',
        in_channels=64,
        sparse_shape=[41, 1600, 1408],
        base_channels=16,
        output_channels=128,
        encoder_channels=((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64)),
        encoder_paddings=((1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1)),
        conv_out_kernel=(3, 1, 1),
        conv_out_stride=(2, 1, 1)),
    backbone=dict(
        type='SECOND', in_channels=256, layer_nums=[5, 5],
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
    max_epochs=40,
    optimizer=dict(type='adamw', lr=0.003, weight_decay=0.01),
    scheduler=dict(type='cyclic', target_ratio=(10, 1e-4),
                   step_ratio_up=0.4),
    clip_grad_norm=35.0,
    batch_size=16,
)

data_root = 'data/kitti/'
