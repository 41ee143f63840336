# VoteNet SUN RGB-D (ref config: configs/votenet/votenet_8xb16_sunrgbd-3d.py)
class_names = ['bed', 'table', 'sofa', 'chair', 'toilet', 'desk',
               'dresser', 'night_stand', 'bookshelf', 'bathtub']

model = dict(
    type='VoteNet',
    backbone=dict(
        type='PointNet2SASSG',
        in_channels=4,
        num_points=(2048, 1024, 512, 256),
        radius=(0.2, 0.4, 0.8, 1.2),
        num_samples=(64, 32, 16, 16),
        sa_channels=((64, 64, 128), (128, 128, 256), (128, 128, 256),
                     (128, 128, 256)),
        fp_channels=((256, 256), (256, 256))),
    bbox_head=dict(
        type='VoteHead',
        num_classes=10,
        in_channels=256,
        num_proposals=256,
        agg_radius=0.3,
        agg_num_sample=16,
        agg_channels=(128, 128, 128),
        num_dir_bins=12,
        mean_sizes=[[2.114256, 1.620300, 0.927272],
                    [0.791118, 1.279516, 0.718182],
                    [0.923508, 1.867419, 0.845495],
                    [0.591958, 0.552978, 0.827272],
                    [0.699104, 0.454178, 0.75625],
                    [0.69519, 1.346299, 0.736364],
                    [0.528526, 1.002642, 1.172878],
                    [0.500618, 0.632163, 0.683424],
                    [0.404671, 1.071108, 1.688889],
                    [0.76584, 1.398258, 0.472728]]),
)

train_cfg = dict(
    max_epochs=36,
    optimizer=dict(type='adamw', lr=0.008, weight_decay=0.01),
    scheduler=dict(type='step', milestones=[24, 32], gamma=0.1),
    clip_grad_norm=10.0,
    batch_size=16,
)

# ---- data (ref configs/_base_/datasets/sunrgbd-3d.py train pipeline) ----
data_root = 'data/sunrgbd/'
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
         load_dim=6, use_dim=[0, 1, 2]),
    dict(type='LoadAnnotations3D'),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.523599, 0.523599],
         scale_ratio_range=[0.85, 1.15]),
    dict(type='PointSample', num_points=20000),
    dict(type='Pack3DDetInputs', num_points=20000, max_gt=64),
]
train_dataloader = dict(dataset=dict(
    type='SUNRGBDDataset', data_root=data_root,
    ann_file='sunrgbd_infos_train.pkl',
    data_prefix=dict(pts='points'), pipeline=train_pipeline))
