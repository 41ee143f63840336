# MinkUNet SemanticKITTI (ref config:
# configs/minkunet/minkunet34_w32_torchsparse_8xb2-laser-polar-mix-3x_semantickitti.py).
class_names = [
    'car', 'bicycle', 'motorcycle', 'truck', 'bus', 'person',
    'bicyclist', 'motorcyclist', 'road', 'parking', 'sidewalk',
    'other-ground', 'building', 'fence', 'vegetation', 'trunck',
    'terrian', 'pole', 'traffic-sign'
]

model = dict(
    type='MinkUNet',
    num_classes=19,
    voxel_size=[0.05, 0.05, 0.05],
    point_cloud_range=[-100, -100, -20, 100, 100, 20],
    max_voxels=120000,
    backbone=dict(
        type='MinkUNetBackbone',
        in_channels=4,
        base_channels=32,
        encoder_channels=[32, 64, 128, 256],
        decoder_channels=[256, 128, 96, 96],
        # ~2x margin over measured stride-2 demand (120k-pt scan →
        # 42k/25k/13k/7k active voxels per stage); without these every
        # stage ran at the 120k input capacity and the 256-ch stage
        # gathered ~3.3 GB per conv
        stage_capacities=[84000, 52000, 28000, 14400]),
)

train_cfg = dict(
    max_epochs=36,
    optimizer=dict(type='adamw', lr=0.008, weight_decay=0.0001),
    scheduler=dict(type='cosine', min_lr_ratio=0.001),
    clip_grad_norm=10.0,
    batch_size=16,
)

data_root = 'data/semantickitti/'
