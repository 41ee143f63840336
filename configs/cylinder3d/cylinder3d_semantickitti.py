# Cylinder3D SemanticKITTI (ref config:
# configs/cylinder3d/cylinder3d_4xb4-3x_semantickitti.py — cylindrical
# partition 480x360x32).
class_names = [
    'car', 'bicycle', 'motorcycle', 'truck', 'bus', 'person',
    'bicyclist', 'motorcyclist', 'road', 'parking', 'sidewalk',
    'other-ground', 'building', 'fence', 'vegetation', 'trunck',
    'terrian', 'pole', 'traffic-sign'
]

model = dict(
    type='Cylinder3D',
    num_classes=19,
    grid_shape=[480, 360, 32],
    pc_range_cyl=[0.0, -3.14159265359, -4.0, 50.0, 3.14159265359, 2.0],
    max_voxels=120000,
    backbone=dict(
        type='MinkUNetBackbone',
        in_channels=6,
        base_channels=32,
        encoder_channels=[32, 64, 128, 256],
        decoder_channels=[256, 128, 96, 96],
        # ~2.5x margin over measured cylindrical stride-2 demand
        # (120k-pt scan → 31k input / 12.7k/4.9k/1.4k/0.5k per stage);
        # the cylindrical grid coarsens fast in (rho,phi), so deep
        # stages were >99% padding at the 120k input capacity
        stage_capacities=[32000, 12800, 4000, 1600]),
)

train_cfg = dict(
    max_epochs=36,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.01),
    scheduler=dict(type='step', milestones=[30], gamma=0.1),
    clip_grad_norm=10.0,
    batch_size=16,
)

data_root = 'data/semantickitti/'
