# PointNet++ SSG S3DIS segmentation (ref config:
# configs/pointnet2/pointnet2_ssg_2xb16-cosine-50e_s3dis-seg.py).
class_names = ['ceiling', 'floor', 'wall', 'beam', 'column', 'window',
               'door', 'table', 'chair', 'sofa', 'bookcase', 'board',
               'clutter']

model = dict(
    type='PointNet2Seg',
    num_classes=13,
    channels=[128],
    dropout=0.5,
    backbone=dict(
        type='PointNet2SASSG',
        in_channels=9,                 # xyz + rgb + normalized xyz
        num_points=(1024, 256, 64, 16),
        radius=(0.1, 0.2, 0.4, 0.8),
        num_samples=(32, 32, 32, 32),
        sa_channels=((32, 32, 64), (64, 64, 128), (128, 128, 256),
                     (256, 256, 512)),
        fp_channels=((256, 256), (256, 256), (256, 128),
                     (128, 128, 128))),
)

train_cfg = dict(
    max_epochs=50,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.001),
    scheduler=dict(type='cosine', min_lr_ratio=0.01),
    clip_grad_norm=10.0,
    batch_size=32,
)

data_root = 'data/s3dis/'
