"""MinkUNet sparse segmentor end-to-end + SegMetric."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.testing import build_detector_from_cfg


def test_minkunet_seg():
    cfg = dict(
        type='MinkUNet',
        num_classes=5,
        voxel_size=[0.8, 0.8, 0.4],
        point_cloud_range=[-12.8, -12.8, -3.2, 12.8, 12.8, 3.2],
        max_voxels=512,
        backbone=dict(
            type='MinkUNetBackbone',
            in_channels=4,
            base_channels=8,
            encoder_channels=[8, 16, 32, 32],
            decoder_channels=[16, 16, 16]))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B, P = 2, 256
    pts = rng.uniform([-12, -12, -3, 0], [12, 12, 3, 1],
                      (B, P, 4)).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool),
                 pts_semantic_mask=jnp.asarray(
                     rng.integers(0, 5, (B, P)), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses = model.apply(variables, batch, mode='loss')
    assert np.isfinite(float(losses['loss_sem_seg']))
    preds = model.apply(variables, batch, mode='predict')
    assert preds['pts_semantic_mask'].shape == (B, P)

    from tpu_bev3d.evaluation import SegMetric
    m = SegMetric(classes=['a', 'b', 'c', 'd', 'e'])
    m.process({k: np.asarray(v) for k, v in preds.items()},
              {k: np.asarray(v) for k, v in batch.items()})
    out = m.compute_metrics()
    assert 0.0 <= out['miou'] <= 1.0
    # perfect predictions → miou 1
    m2 = SegMetric(classes=['a', 'b', 'c', 'd', 'e'])
    m2.process(dict(pts_semantic_mask=batch['pts_semantic_mask'],
                    mask=np.ones((B, P), bool)),
               dict(pts_semantic_mask=batch['pts_semantic_mask']))
    assert m2.compute_metrics()['miou'] == 1.0


def test_cylinder3d_seg():
    cfg = dict(
        type='Cylinder3D',
        num_classes=5,
        grid_shape=[32, 24, 8],
        pc_range_cyl=[0.0, -3.14159265, -4.0, 50.0, 3.14159265, 2.0],
        max_voxels=512,
        backbone=dict(
            type='MinkUNetBackbone',
            in_channels=4,
            base_channels=8,
            encoder_channels=[8, 16, 16],
            decoder_channels=[8, 8]))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B, P = 1, 256
    pts = rng.uniform([-30, -30, -3, 0], [30, 30, 1, 1],
                      (B, P, 4)).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((B, P), bool),
                 pts_semantic_mask=jnp.asarray(
                     rng.integers(0, 5, (B, P)), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses = model.apply(variables, batch, mode='loss')
    assert np.isfinite(float(losses['loss_sem_seg']))
    preds = model.apply(variables, batch, mode='predict')
    assert preds['pts_semantic_mask'].shape == (B, P)
