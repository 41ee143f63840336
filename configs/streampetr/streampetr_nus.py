# StreamPETR nuScenes (ref: projects/StreamPETR configs
# stream_petr_vov_flash_800_bs2_seq_24e.py — 900 queries, 6 decoder
# layers, 256 dims, 128 propagated; VoVNet-99 backbone).
class_names = [
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone'
]
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]

model = dict(
    type='StreamPETR',
    image_size=[320, 800],
    num_propagated=128,
    img_backbone=dict(
        type='VoVNetCP', out_indices=(2, 3), use_checkpoint=True),
    img_neck=dict(
        type='CPFPN', in_channels=[768, 1024], out_channels=256,
        num_outs=2),
    bbox_head=dict(
        type='StreamPETRHeadDN',
        num_classes=10,
        in_channels=256,
        embed_dims=256,
        num_query=644,
        num_layers=6,
        nhead=8,
        depth_num=64,
        num_dn_groups=4,
        pc_range=point_cloud_range),
)

train_cfg = dict(
    max_epochs=24,
    optimizer=dict(type='adamw', lr=0.0004, weight_decay=0.01),
    scheduler=dict(type='cosine', min_lr_ratio=0.001),
    clip_grad_norm=35.0,
    batch_size=16,
)

data_root = 'data/nuscenes/'
