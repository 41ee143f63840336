"""ImVoxelNet camera-to-voxel detector end-to-end on tiny shapes."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.testing import (build_detector_from_cfg,
                               create_multimodal_inputs)


def test_imvoxelnet():
    cfg = dict(
        type='ImVoxelNet',
        n_voxels=[32, 32, 4],
        point_cloud_range=[-50, -50, -5, 50, 50, 3],
        image_size=[64, 176],
        out_channels=16,
        img_backbone=dict(
            type='SwinTransformer', embed_dims=32, depths=[2, 2],
            num_heads=[2, 4], window_size=7, out_indices=[0, 1]),
        img_neck=dict(
            type='GeneralizedLSSFPN', in_channels=[32, 64],
            out_channels=32, num_outs=1),
        bbox_head=dict(
            type='Anchor3DHead', num_classes=3, in_channels=16,
            anchor_generator=dict(
                type='AlignedAnchor3DRangeGenerator',
                ranges=[[-50, -50, -1.8, 50, 50, -1.8]],
                sizes=[[4.6, 1.95, 1.72], [1.76, 0.6, 1.73],
                       [0.8, 0.6, 1.73]],
                rotations=[0, 1.57]),
            assigner_cfgs=[dict(pos_iou_thr=0.5, neg_iou_thr=0.35,
                                min_pos_iou=0.35)] * 3,
            nms_pre=32, max_num=8))
    model = build_detector_from_cfg(cfg)
    batch = create_multimodal_inputs(batch_size=1, num_points=32,
                                     image_size=(64, 176), num_cams=2,
                                     num_classes=3,
                                     pc_range=(-50, -50, -5, 50, 50, 3),
                                     with_velocity=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (1, 8, 7)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
