# VoteNet ScanNet (ref config: configs/votenet/votenet_8xb8_scannet-3d.py)
_base_ = './votenet_sunrgbd.py'

class_names = ['cabinet', 'bed', 'chair', 'sofa', 'table', 'door',
               'window', 'bookshelf', 'picture', 'counter', 'desk',
               'curtain', 'refrigerator', 'showercurtrain', 'toilet',
               'sink', 'bathtub', 'garbagebin']

model = dict(
    bbox_head=dict(
        num_classes=18,
        num_dir_bins=1,           # ScanNet boxes are axis-aligned
        mean_sizes=[[0.76966727, 0.8116021, 0.92573744],
                    [1.876858, 1.8425595, 1.1931566],
                    [0.61328, 0.6148609, 0.7182701],
                    [1.3955007, 1.5121545, 0.83443564],
                    [0.97949594, 1.0675149, 0.6329687],
                    [0.531663, 0.5955577, 1.7500148],
                    [0.9624706, 0.72462326, 1.1481868],
                    [0.83221924, 1.0490936, 1.6875663],
                    [0.21132214, 0.4206159, 0.5372846],
                    [1.4440073, 1.8970833, 0.26985747],
                    [1.0294262, 1.4040797, 0.87554324],
                    [1.3766412, 0.65521795, 1.6813129],
                    [0.6650819, 0.71111923, 1.298853],
                    [0.41999173, 0.37906948, 1.7513971],
                    [0.59359556, 0.5912492, 0.73919016],
                    [0.50867593, 0.50656086, 0.30136237],
                    [1.1511526, 1.0546296, 0.49706793],
                    [0.47535285, 0.49249494, 0.5802117]]),
)

data_root = 'data/scannet/'

# ---- data (ref configs/_base_/datasets/scannet-3d.py train pipeline) ----
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
         load_dim=6, use_dim=[0, 1, 2]),
    dict(type='LoadAnnotations3D', with_seg_3d=True),
    dict(type='GlobalAlignment', rotation_axis=2),
    dict(type='PointSample', num_points=40000),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.087266, 0.087266],
         scale_ratio_range=[1.0, 1.0]),
    dict(type='Pack3DDetInputs', num_points=40000, max_gt=64),
]
train_dataloader = dict(dataset=dict(
    type='ScanNetDataset', data_root=data_root,
    ann_file='scannet_infos_train.pkl',
    data_prefix=dict(pts='points', pts_semantic_mask='semantic_mask',
                     pts_instance_mask='instance_mask'),
    pipeline=train_pipeline))
