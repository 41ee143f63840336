# 3DSSD KITTI Car (ref: configs/3dssd/3dssd_4xb4_kitti-3d-car.py —
# PointNet2SAMSG with fusion sampling (F-FPS/D-FPS) + SSD3DHead candidate
# generation with centerness targets).
class_names = ['Car']

model = dict(
    type='VoteNet',                  # single-stage point shell
    backbone=dict(
        type='PointNet2SAMSG',
        in_channels=4,
        num_points=(512, 128, 64),
        radii=((0.2, 0.4, 0.8), (0.4, 0.8, 1.6), (1.6, 3.2, 4.8)),
        num_samples=((8, 8, 16), (8, 8, 8), (8, 8, 8)),
        sa_channels=(((16, 32), (16, 32), (32, 64)),
                     ((64, 128), (64, 128), (64, 128)),
                     ((128, 256), (128, 256), (128, 256))),
        fps_mods=(('D-FPS',), ('FS',), ('F-FPS', 'D-FPS'))),
    bbox_head=dict(
        type='SSD3DHead',
        num_classes=1,
        in_channels=768,
        num_candidates=64,
        vote_xyz_range=[3.0, 3.0, 2.0],
        agg_radii=[4.8, 6.4],
        agg_samples=[16, 32],
        agg_channels=[[64, 64, 128], [64, 64, 128]],
        num_dir_bins=12),
)

train_cfg = dict(
    max_epochs=72,
    optimizer=dict(type='adamw', lr=0.002, weight_decay=0.01),
    scheduler=dict(type='cosine', warmup_steps=300),
    clip_grad_norm=10.0,
    batch_size=4,
)
