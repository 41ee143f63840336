# BEVFusion L+C — the TPU-fast flagship variant benchmarked in bench.py.
#
# Deviations from the reference model (all documented TPU-first
# redesigns; use bevfusion_lidar_cam_voxel0075_second_secfpn_nus.py for
# checkpoint-parity work):
# - BEVColumnEncoder replaces the sparse 3D encoder: z folded into
#   channels at scatter time with the stem 1x1 conv fused into the
#   scatter (fused_stem_scatter) — all compute is large 2D MXU convs.
# - bfloat16 compute with fp32 islands (view-transform geometry, head).
# - depth_topk sparsified LSS lift: only the top-k depth bins per pixel
#   are scattered (softmax depth mass is sharply peaked; exact mode via
#   depth_topk=0).
_base_ = './bevfusion_lidar_cam_voxel0075_second_secfpn_nus.py'

model = dict(
    # single-sweep serving capacity: >=1.2x margin over the worst case
    # of a 30k-point keyframe cloud (every in-range point its own
    # voxel; the real demo frame fills ~17.5k). Fixed-shape capacity is
    # a first-class TPU perf lever (68000 -> 36000 measured +0.9 fps,
    # docs/benchmarks.md). For 10-sweep training raise to 120000 (the
    # faithful multisweep sizing in the _base_ chain).
    max_voxels=36000,
    compute_dtype='bfloat16',
    # window 8 removes Swin's pad waste at 256x704 (w=7 pads stages by
    # +13/+13/+47/+100%; w=8 by +0/+0/+9/+9%) — measured +12% e2e fps.
    # Torch w=7 checkpoints import via rel-pos-bias interpolation.
    # train memory knob: img_backbone=dict(remat=True) rematerializes the
    # Swin blocks in backward (exact grads, ~1 extra fwd of FLOPs) —
    # enables larger per-chip train batches; inference is unaffected
    img_backbone=dict(window_size=8),
    view_transform=dict(depth_topk=24),
    middle_encoder=dict(
        _delete_=True,
        type='BEVColumnEncoder',
        in_channels=5,
        sparse_shape=[41, 1440, 1440],
        fused_stem=True,
        pack_xy=4,
        stem_channels=128,
        stage_channels=[128, 256, 256],
        stage_strides=[1, 2, 1],
        output_channels=256,
        voxel_size=[0.075, 0.075, 0.2],
        point_cloud_range=[-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]),
)
