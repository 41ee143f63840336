"""DfM: plane-sweep stereo from motion -> BEV detection."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_bev3d.testing import build_detector_from_cfg


def test_dfm_loss_and_predict():
    cfg = dict(
        type='DfM',
        image_size=(64, 128),
        num_groups=4,
        xbound=[0.0, 25.6, 1.6], ybound=[-12.8, 12.8, 1.6],
        zbound=[-3.0, 3.0, 6.0], dbound=[2.0, 26.0, 4.0],
        img_backbone=dict(type='SwinTransformer', embed_dims=16,
                          depths=[2, 2], num_heads=[2, 4], window_size=7,
                          out_indices=[0, 1]),
        img_neck=dict(type='GeneralizedLSSFPN', in_channels=[16, 32],
                      out_channels=16, num_outs=1),
        backbone=dict(type='SECOND', in_channels=16,
                      out_channels=[16, 32], layer_nums=[1, 1],
                      layer_strides=[1, 2]),
        neck=dict(type='SECONDFPN', in_channels=[16, 32],
                  out_channels=[16, 16], upsample_strides=[1, 2]),
        bbox_head=dict(
            type='Anchor3DHead', num_classes=3, in_channels=32,
            feat_channels=32,
            anchor_generator=dict(
                type='Anchor3DRangeGenerator',
                ranges=[[0, -12.8, -1.8, 25.6, 12.8, -1.8]] * 3,
                sizes=[[3.9, 1.6, 1.56], [0.8, 0.6, 1.73],
                       [1.76, 0.6, 1.73]],
                rotations=[0, 1.57]),
            nms_pre=64, max_num=16))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B = 1
    imgs = rng.normal(size=(B, 2, 64, 128, 3)).astype(np.float32)
    cam2img = np.tile(np.array([[60., 0, 64], [0, 60., 32], [0, 0, 1]],
                               np.float32), (B, 1, 1))
    pose = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    pose[:, 0, 3] = 0.5     # small forward motion
    cam2lidar = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    cam2lidar[:, :3, :3] = R
    gtb = np.concatenate(
        [np.stack([rng.uniform(5, 20, (B, 3)),
                   rng.uniform(-8, 8, (B, 3)),
                   np.full((B, 3), -1.8)], -1),
         rng.uniform(0.8, 4, (B, 3, 3)),
         rng.uniform(-np.pi, np.pi, (B, 3, 1))], -1).astype(np.float32)
    batch = dict(imgs=jnp.asarray(imgs), cam2img=jnp.asarray(cam2img),
                 pose=jnp.asarray(pose), cam2lidar=jnp.asarray(cam2lidar),
                 gt_bboxes_3d=jnp.asarray(gtb),
                 gt_labels_3d=jnp.asarray(rng.integers(0, 3, (B, 3))),
                 gt_mask=jnp.ones((B, 3), bool))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    preds = model.apply(variables, batch, mode='predict')
    assert np.isfinite(np.asarray(preds['bboxes'])).all()
