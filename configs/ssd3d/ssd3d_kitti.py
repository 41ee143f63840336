# 3DSSD-style point-based detector (ref: configs/3dssd/3dssd_4xb4_kitti-3d-car.py
# — PointNet2SAMSG encoder + candidate/vote head; here the shared VoteHead
# machinery serves as the candidate head).
class_names = ['Car']

model = dict(
    type='VoteNet',
    backbone=dict(
        type='PointNet2SAMSG',
        in_channels=4,
        num_points=(512, 128, 64),
        radii=((0.2, 0.4, 0.8), (0.4, 0.8, 1.6), (1.6, 3.2, 4.8)),
        num_samples=((8, 8, 16), (8, 8, 8), (8, 8, 8)),
        sa_channels=(((16, 32), (16, 32), (32, 64)),
                     ((64, 128), (64, 128), (64, 128)),
                     ((128, 256), (128, 256), (128, 256)))),
    bbox_head=dict(
        type='VoteHead',
        num_classes=1,
        in_channels=768,
        num_proposals=64,
        agg_radius=2.0,
        agg_num_sample=16,
        agg_channels=(128, 128),
        num_dir_bins=12,
        mean_sizes=[[3.9, 1.6, 1.56]]),
)

train_cfg = dict(
    max_epochs=72,
    optimizer=dict(type='adamw', lr=0.002, weight_decay=0.01),
    scheduler=dict(type='step', milestones=[45, 60], gamma=0.1),
    clip_grad_norm=35.0,
    batch_size=4,
)
