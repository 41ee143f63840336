# Part-A² KITTI 3-class (ref: configs/parta2/parta2_hv_secfpn_8xb2-cyclic-
#   80e_kitti-3d-3class.py)
voxel_size = [0.05, 0.05, 0.1]
point_cloud_range = [0, -40, -3, 70.4, 40, 1]
class_names = ['Pedestrian', 'Cyclist', 'Car']

model = dict(
    type='PartA2',
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_num_points=5,
    max_voxels=16000,
    voxel_encoder=dict(type='HardSimpleVFE'),
    middle_encoder=dict(
        type='SparseUNet',
        # block-sparse tile backend (r5): same semantics as the flat
        # gather-GEMM UNet (model-level exactness test
        # tests/test_models/test_sparse_unet_tile.py), in the TPU
        # performance class. Caps sized on the surface-clustered 20k-pt
        # generator (4701/1996/794/322 active tiles per stage) with
        # ~1.7x margin; overruns visible via TPU_BEV3D_TILE_DEBUG=1.
        backend='tile',
        tile_shape=(2, 4, 4),
        tile_capacities=[8192, 4096, 2048, 1024],
        tile_dtype='bfloat16',
        in_channels=4,
        sparse_shape=[41, 1600, 1408],
        base_channels=16,
        output_channels=128,
        stage_capacity_factor=0.6),
    backbone=dict(
        type='SECOND',
        in_channels=256,
        layer_nums=[5, 5],
        layer_strides=[1, 2],
        out_channels=[128, 256]),
    neck=dict(
        type='SECONDFPN',
        in_channels=[128, 256],
        upsample_strides=[1, 2],
        out_channels=[256, 256]),
    rpn_head=dict(
        type='Anchor3DHead',
        num_classes=3,
        in_channels=512,
        feat_channels=512,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='Anchor3DRangeGenerator',
            ranges=[[0, -40.0, -0.6, 70.4, 40.0, -0.6],
                    [0, -40.0, -0.6, 70.4, 40.0, -0.6],
                    [0, -40.0, -1.78, 70.4, 40.0, -1.78]],
            sizes=[[0.8, 0.6, 1.73], [1.76, 0.6, 1.73], [3.9, 1.6, 1.56]],
            rotations=[0, 1.57]),
        assigner_cfgs=[
            dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
            dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
            dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45)],
        diff_rad_by_sin=True,
        nms_pre=512,
        score_thr=0.05,
        nms_iou_thr=0.8,
        max_num=128),
    seg_head=dict(
        type='PointwiseSemanticHead',
        in_channels=16,
        extra_width=0.2),
    roi_head=dict(
        type='PartA2RoIHead',
        seg_channels=16,
        grid_size=14,
        voxel_size=voxel_size,
        point_cloud_range=point_cloud_range,
        # top-K-nearest candidate capacity per RoI (superset pool — equal
        # to all-pairs whenever a box holds ≤ 1024 voxels, which covers
        # KITTI objects at 0.05 m with wide margin; 25× fewer scatter
        # rows, measured 1107 ms → see docs/benchmarks.md Part-A2)
        roi_candidates=1024),
)

train_cfg = dict(
    max_epochs=80,
    optimizer=dict(type='adamw', lr=0.001, weight_decay=0.01),
    scheduler=dict(type='cosine', warmup_steps=500),
    clip_grad_norm=10.0,
    batch_size=2,
)
