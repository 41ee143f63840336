# DGCNN S3DIS semantic segmentation (ref config:
# configs/dgcnn/dgcnn_4xb32-cosine-100e_s3dis-seg_test-area5.py).
class_names = ['ceiling', 'floor', 'wall', 'beam', 'column', 'window',
               'door', 'table', 'chair', 'sofa', 'bookcase', 'board',
               'clutter']

model = dict(
    type='PointNet2Seg',          # encoder-decoder shell; DGCNN returns
    num_classes=13,               # the same full-res fp_features contract
    channels=[512, 256],
    dropout=0.5,
    backbone=dict(
        type='DGCNNBackbone',
        in_channels=9,            # xyz + rgb + normalized xyz
        edge_channels=((64, 64), (64, 64), (64,)),
        k=20,
        out_channels=1024),
)

train_cfg = dict(
    max_epochs=100,
    optimizer=dict(type='sgd', lr=0.1, weight_decay=0.0001),
    scheduler=dict(type='cosine', min_lr_ratio=0.01),
    clip_grad_norm=10.0,
    batch_size=32,
)

data_root = 'data/s3dis/'
train_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=6, use_dim=6),
    dict(type='LoadAnnotations3D', with_bbox_3d=False, with_label_3d=False,
         with_seg_3d=True),
    dict(type='IndoorPatchPointSample', num_points=4096, block_size=1.0,
         ignore_index=13, use_normalized_coord=True),
    dict(type='Pack3DDetInputs', num_points=4096, max_gt=1),
]
train_dataloader = dict(dataset=dict(
    type='S3DISSegDataset', data_root=data_root,
    ann_file='s3dis_infos_Area_1.pkl', pipeline=train_pipeline))
