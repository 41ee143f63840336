# PointRCNN KITTI (ref: configs/point_rcnn/point-rcnn_8xb2_kitti-3d-3class.py)
class_names = ['Pedestrian', 'Cyclist', 'Car']
point_cloud_range = [0, -40, -3, 70.4, 40, 1]

model = dict(
    type='PointRCNN',
    backbone=dict(
        type='PointNet2SASSG',
        in_channels=4,
        num_points=[1024, 256, 64, 16],
        radius=[0.5, 1.0, 2.0, 4.0],
        num_samples=[32, 32, 32, 32],
        sa_channels=[[64, 64, 128], [128, 128, 256], [128, 128, 256],
                     [128, 128, 256]],
        fp_channels=[[256, 256], [256, 256], [256, 128]]),
    rpn_head=dict(
        type='PointRPNHead',
        num_classes=3,
        in_channels=128,
        cls_channels=[256, 256],
        reg_channels=[256, 256],
        enlarge_width=0.1,
        nms_pre=512,
        nms_iou_thr=0.8,
        max_num=128),
    roi_head=dict(
        type='PointRCNNRoIHead',
        in_channels=128,
        num_points=64,
        mlp_channels=[128, 128],
        fc_channels=[256, 256]),
)

train_cfg = dict(
    max_epochs=80,
    optimizer=dict(type='adamw', lr=0.002, weight_decay=0.01),
    scheduler=dict(type='cosine', warmup_steps=500),
    clip_grad_norm=10.0,
    batch_size=2,
)
