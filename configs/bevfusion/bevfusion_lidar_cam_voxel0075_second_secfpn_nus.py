# BEVFusion LiDAR + camera, nuScenes — the flagship config.
# Ref config: projects/BEVFusion/configs/nuscenes/
#   bevfusion_lidar-cam_voxel0075_second_secfpn_8xb4-cyclic-20e_nus-3d.py
_base_ = './bevfusion_lidar_voxel0075_second_secfpn_nus.py'

model = dict(
    img_backbone=dict(
        type='SwinTransformer',
        embed_dims=96,
        depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24],
        window_size=7,
        out_indices=[1, 2, 3],
        # ref config :24-26 — Swin-T training recipe
        drop_path_rate=0.2,
        drop_rate=0.0,
        attn_drop_rate=0.0),
    img_neck=dict(
        type='GeneralizedLSSFPN',
        in_channels=[192, 384, 768],
        out_channels=256,
        num_outs=3),
    view_transform=dict(
        type='DepthLSSTransform',
        in_channels=256,
        out_channels=80,
        image_size=[256, 704],
        feature_size=[32, 88],
        xbound=[-54.0, 54.0, 0.3],
        ybound=[-54.0, 54.0, 0.3],
        zbound=[-10.0, 10.0, 20.0],
        dbound=[1.0, 60.0, 0.5],
        downsample=2),
    fuser=dict(type='ConvFuser', out_channels=256),
)
