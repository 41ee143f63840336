# SSN nuScenes: PointPillars features + shape-aware grouped heads
# (ref config: configs/ssn/ssn_hv_secfpn_sbn-all_16xb2-2x_nus-3d.py,
# head ref: mmdet3d/models/dense_heads/shape_aware_head.py:1-537).
voxel_size = [0.25, 0.25, 8]
point_cloud_range = [-50, -50, -5, 50, 50, 3]
class_names = [
    'car', 'truck', 'trailer', 'bus', 'construction_vehicle', 'bicycle',
    'motorcycle', 'pedestrian', 'traffic_cone', 'barrier'
]
_rng = [[-50, -50, -1.8, 50, 50, -1.8]]

model = dict(
    type='VoxelNet',
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_num_points=20,
    max_voxels=30000,
    voxel_encoder=dict(
        type='PillarFeatureNet', in_channels=5, feat_channels=[64],
        with_distance=False, voxel_size=voxel_size,
        point_cloud_range=point_cloud_range),
    middle_encoder=dict(
        type='PointPillarsScatter', in_channels=64,
        output_shape=[400, 400]),
    backbone=dict(
        type='SECOND', in_channels=64, layer_nums=[3, 5, 5],
        layer_strides=[2, 2, 2], out_channels=[64, 128, 256]),
    neck=dict(
        type='SECONDFPN', in_channels=[64, 128, 256],
        upsample_strides=[1, 2, 4], out_channels=[128, 128, 128]),
    bbox_head=dict(
        type='ShapeAwareHead',
        num_classes=10,
        in_channels=384,
        box_code_size=9,          # nuScenes: + velocity
        # shape groups (ref ssn config anchor_generator per-class sizes,
        # grouped small->large)
        tasks=[
            dict(class_ids=[5, 6, 7, 8],          # bike/moto/ped/cone
                 ranges=_rng * 4,
                 sizes=[[1.68452161, 0.60058911, 1.27192197],
                        [2.09973778, 0.76279481, 1.44403034],
                        [0.72564370, 0.66344886, 1.75748069],
                        [0.40359262, 0.39694519, 1.06232151]],
                 shared_conv_channels=(64, 64),
                 shared_conv_strides=(1, 1)),
            dict(class_ids=[0, 9],                # car/barrier
                 ranges=_rng * 2,
                 sizes=[[4.60718145, 1.95017717, 1.72270761],
                        [0.48578221, 2.49008838, 0.98297065]],
                 shared_conv_channels=(64, 64, 64),
                 shared_conv_strides=(1, 1, 1)),
            dict(class_ids=[1, 2, 3, 4],          # truck/trailer/bus/cv
                 ranges=_rng * 4,
                 sizes=[[6.73778078, 2.45609390, 2.73004906],
                        [12.01320693, 2.87427237, 3.81509561],
                        [11.1885991, 2.94046906, 3.47030982],
                        [6.38352896, 2.73050468, 3.13312415]],
                 shared_conv_channels=(64, 64, 64),
                 shared_conv_strides=(1, 1, 1)),
        ],
        assigner_cfgs=[dict(pos_iou_thr=0.5, neg_iou_thr=0.3,
                            min_pos_iou=0.3)] * 10,
        nms_pre=1000, max_num=500),
)

train_cfg = dict(
    max_epochs=24,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.01),
    scheduler=dict(type='step', milestones=[20, 23], gamma=0.1),
    clip_grad_norm=10.0,
    batch_size=32,
)

data_root = 'data/nuscenes/'
