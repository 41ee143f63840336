# GroupFree3D ScanNet (ref config:
# configs/groupfree3d/groupfree3d_head-L6-O256_4xb8_scannet-seg.py).
class_names = ['cabinet', 'bed', 'chair', 'sofa', 'table', 'door',
               'window', 'bookshelf', 'picture', 'counter', 'desk',
               'curtain', 'refrigerator', 'showercurtrain', 'toilet',
               'sink', 'bathtub', 'garbagebin']

model = dict(
    type='VoteNet',          # shared single-stage point-detector shell
    backbone=dict(
        type='PointNet2SASSG',
        in_channels=4,
        num_points=(2048, 1024, 512, 256),
        radius=(0.2, 0.4, 0.8, 1.2),
        num_samples=(64, 32, 16, 16),
        sa_channels=((64, 64, 128), (128, 128, 256), (128, 128, 256),
                     (128, 128, 256)),
        fp_channels=((256, 256), (256, 288))),
    bbox_head=dict(
        type='GroupFree3DHead',
        num_classes=18,
        in_channels=288,
        hidden_channel=288,
        num_proposals=256,
        num_decoder_layers=6,
        num_heads=8,
        ffn_channel=2048,
        max_num=256),
)

train_cfg = dict(
    max_epochs=400,
    optimizer=dict(type='adamw', lr=0.006, weight_decay=0.0005),
    scheduler=dict(type='step', milestones=[280, 340], gamma=0.1),
    clip_grad_norm=0.1,
    batch_size=32,
)

data_root = 'data/scannet/'
