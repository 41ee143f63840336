# SPVCNN SemanticKITTI segmentation (ref config:
# configs/spvcnn/spvcnn_w32_8xb2-amp-laser-polar-mix-3x_semantickitti.py).
model = dict(
    type='MinkUNet',              # sparse segmentor shell; the SPVCNN
    num_classes=19,               # backbone adds the point branch
    voxel_size=[0.05, 0.05, 0.05],
    point_cloud_range=[-100, -100, -20, 100, 100, 20],
    max_voxels=120000,
    backbone=dict(
        type='SPVCNNBackbone',
        in_channels=4,
        base_channels=32,
        encoder_channels=[32, 64, 128, 256],
        decoder_channels=[256, 128, 96, 96],
        point_channels=[96]),
)

train_cfg = dict(
    max_epochs=36,
    optimizer=dict(type='adamw', lr=0.24, weight_decay=0.0001),
    scheduler=dict(type='cosine', min_lr_ratio=0.001),
    clip_grad_norm=10.0,
    batch_size=16,
)

data_root = 'data/semantickitti/'
# laser+polar-mix recipe like the ref config name says
train_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
    dict(type='LoadAnnotations3D', with_bbox_3d=False, with_label_3d=False,
         with_seg_3d=True),
    dict(type='LaserMix', num_areas=[3, 4, 5, 6], pitch_angles=[-25, 3],
         prob=0.5,
         pre_transform=[
             dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
             dict(type='LoadAnnotations3D', with_bbox_3d=False,
                  with_label_3d=False, with_seg_3d=True)]),
    dict(type='PolarMix', instance_classes=[0, 1, 2, 3, 4, 5, 6, 7],
         swap_ratio=0.5, rotate_paste_ratio=1.0, prob=0.5,
         pre_transform=[
             dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
             dict(type='LoadAnnotations3D', with_bbox_3d=False,
                  with_label_3d=False, with_seg_3d=True)]),
    dict(type='GlobalRotScaleTrans', rot_range=[0., 6.28318531],
         scale_ratio_range=[0.95, 1.05]),
    dict(type='Pack3DDetInputs', num_points=120000, max_gt=1),
]
train_dataloader = dict(dataset=dict(
    type='SemanticKittiDataset', data_root=data_root,
    ann_file='semantickitti_infos_train.pkl', pipeline=train_pipeline))
