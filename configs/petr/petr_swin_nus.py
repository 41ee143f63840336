# PETR camera-only nuScenes (Swin-T image backbone — the reference's
# VoVNetCP is an alternative backbone choice; ref projects/PETR/configs/
# petr_vovnet_gridmask_p4_800x320.py).
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
class_names = [
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone'
]

model = dict(
    type='PETR',
    image_size=[256, 704],
    img_backbone=dict(
        type='SwinTransformer',
        embed_dims=96,
        depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24],
        window_size=7,
        out_indices=[1, 2, 3]),
    img_neck=dict(
        type='GeneralizedLSSFPN',
        in_channels=[192, 384, 768],
        out_channels=256,
        num_outs=2),
    bbox_head=dict(
        type='PETRHead',
        num_classes=10,
        in_channels=256,
        embed_dims=256,
        num_query=900,
        num_layers=6,
        depth_num=64,
        position_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        pc_range=point_cloud_range,
        with_velocity=True),
)

train_cfg = dict(
    max_epochs=24,
    optimizer=dict(type='adamw', lr=2e-4, weight_decay=0.01),
    scheduler=dict(type='cosine'),
    clip_grad_norm=35.0,
    batch_size=2,
)
