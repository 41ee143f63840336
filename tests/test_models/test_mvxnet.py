"""MVXNet point-level fusion end-to-end on tiny shapes."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.testing import (build_detector_from_cfg,
                               create_multimodal_inputs)


def _cfg():
    pcr = [0, -39.68, -3, 69.12, 39.68, 1]
    return dict(
        type='MVXNet',
        image_size=[64, 176],
        voxel_size=[0.64, 0.64, 4],
        point_cloud_range=pcr,
        max_voxels=256,
        img_backbone=dict(type='SwinTransformer', embed_dims=32,
                          depths=[2, 2], num_heads=[2, 4], window_size=7,
                          out_indices=[0, 1]),
        img_neck=dict(type='GeneralizedLSSFPN', in_channels=[32, 64],
                      out_channels=32, num_outs=1),
        fusion_layer=dict(type='PointFusion', img_channels=32,
                          out_channels=16, image_size=[64, 176]),
        voxel_encoder=dict(type='DynamicVFE', in_channels=20,
                           feat_channels=[32], voxel_size=[0.64, 0.64, 4],
                           point_cloud_range=pcr),
        middle_encoder=dict(type='PointPillarsScatter', in_channels=32,
                            output_shape=[128, 112]),
        backbone=dict(type='SECOND', in_channels=32, layer_nums=[2, 2],
                      layer_strides=[2, 2], out_channels=[32, 64]),
        neck=dict(type='SECONDFPN', in_channels=[32, 64],
                  upsample_strides=[1, 2], out_channels=[32, 32]),
        bbox_head=dict(
            type='Anchor3DHead', num_classes=3, in_channels=64,
            anchor_generator=dict(
                type='AlignedAnchor3DRangeGenerator',
                ranges=[[0, -39.68, -1.78, 69.12, 39.68, -1.78]] * 3,
                sizes=[[0.8, 0.6, 1.73], [1.76, 0.6, 1.73],
                       [3.9, 1.6, 1.56]],
                rotations=[0, 1.57]),
            assigner_cfgs=[dict(pos_iou_thr=0.5, neg_iou_thr=0.35,
                                min_pos_iou=0.35)] * 3,
            nms_pre=32, max_num=8))


def test_mvxnet_fusion():
    model = build_detector_from_cfg(_cfg())
    batch = create_multimodal_inputs(
        batch_size=1, num_points=256, point_dim=4, num_classes=3,
        image_size=(64, 176), num_cams=2,
        pc_range=(0, -39.68, -3, 69.12, 39.68, 1), with_velocity=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (1, 8, 7)
    # fused image features actually reach the detector: zeroing the images
    # must change the loss
    b2 = dict(batch)
    b2['imgs'] = jnp.zeros_like(batch['imgs'])
    losses2, _ = model.apply(variables, b2, mode='loss', train=True,
                             mutable=['batch_stats'])
    assert float(losses2['loss_cls']) != float(losses['loss_cls'])
