# H3DNet ScanNet (ref config: configs/h3dnet/h3dnet_8xb3_scannet-3d.py).
class_names = ['cabinet', 'bed', 'chair', 'sofa', 'table', 'door',
               'window', 'bookshelf', 'picture', 'counter', 'desk',
               'curtain', 'refrigerator', 'showercurtrain', 'toilet',
               'sink', 'bathtub', 'garbagebin']

_backbone = dict(
    type='PointNet2SASSG',
    in_channels=4,
    num_points=(2048, 1024, 512, 256),
    radius=(0.2, 0.4, 0.8, 1.2),
    num_samples=(64, 32, 16, 16),
    sa_channels=((64, 64, 128), (128, 128, 256), (128, 128, 256),
                 (128, 128, 256)),
    fp_channels=((256, 256), (256, 256)))

_prim = dict(type='PrimitiveHead', in_channels=256,
             mlp_channels=[256, 128])

model = dict(
    type='H3DNet',
    backbone=_backbone,
    proposal_head=dict(
        type='VoteHead', num_classes=18, in_channels=256,
        num_proposals=256, agg_radius=0.3, agg_num_sample=16,
        agg_channels=(128, 128, 128), num_dir_bins=24,
        mean_sizes=[[1.0, 1.0, 1.0]] * 18),
    primitive_z=dict(_prim, primitive_type='z'),
    primitive_xy=dict(_prim, primitive_type='xy'),
    primitive_line=dict(_prim, primitive_type='line'),
    roi_head=dict(type='H3DRoIHead', mlp_channels=[128]),
)

train_cfg = dict(
    max_epochs=36,
    optimizer=dict(type='adamw', lr=0.008, weight_decay=0.01),
    scheduler=dict(type='step', milestones=[24, 32], gamma=0.1),
    clip_grad_norm=10.0,
    batch_size=24,
)

data_root = 'data/scannet/'
