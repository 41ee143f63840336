# ImVoxelNet KITTI car (ref config:
# configs/imvoxelnet/imvoxelnet_8xb4_kitti-3d-car.py).
class_names = ['Car']

model = dict(
    type='ImVoxelNet',
    n_voxels=[216, 248, 12],
    point_cloud_range=[-0.16, -39.68, -3.08, 68.96, 39.68, 0.76],
    image_size=[384, 1280],
    out_channels=64,
    img_backbone=dict(
        type='SwinTransformer', embed_dims=96, depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24], window_size=7, out_indices=[1, 2, 3]),
    img_neck=dict(
        type='GeneralizedLSSFPN', in_channels=[192, 384, 768],
        out_channels=64, num_outs=1),
    bbox_head=dict(
        type='Anchor3DHead',
        num_classes=1,
        in_channels=64,
        feat_channels=256,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[[-0.16, -39.68, -1.78, 68.96, 39.68, -1.78]],
            sizes=[[3.9, 1.6, 1.56]],
            rotations=[0, 1.57]),
        assigner_cfgs=[dict(pos_iou_thr=0.6, neg_iou_thr=0.45,
                            min_pos_iou=0.45)],
        nms_pre=100, max_num=50),
)

train_cfg = dict(
    max_epochs=12,
    optimizer=dict(type='adamw', lr=0.0001, weight_decay=0.0001),
    scheduler=dict(type='step', milestones=[8, 11], gamma=0.1),
    clip_grad_norm=35.0,
    batch_size=32,
)

data_root = 'data/kitti/'
