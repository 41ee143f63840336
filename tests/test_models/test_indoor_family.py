"""Indoor family: H3DNet (primitives + matching refine) and ImVoteNet
(2D-vote fusion) — loss + predict on synthetic inputs."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg

BACKBONE = dict(type='PointNet2SASSG', in_channels=4,
                num_points=(128, 64, 32, 16), radius=(0.5, 1.0, 2.0, 4.0),
                num_samples=(16, 16, 16, 16),
                sa_channels=((16, 16), (32, 32), (32, 32), (32, 32)),
                fp_channels=((32, 32), (32, 32)))


def test_h3dnet_loss_and_predict():
    prim = dict(type='PrimitiveHead', in_channels=32,
                mlp_channels=[32, 32])
    cfg = dict(
        type='H3DNet',
        backbone=BACKBONE,
        proposal_head=dict(type='VoteHead', num_classes=5, in_channels=32,
                           num_proposals=16, agg_channels=(32, 32),
                           max_num=8,
                           mean_sizes=[[1.0, 1.0, 1.0]] * 5),
        primitive_z=dict(prim, primitive_type='z'),
        primitive_xy=dict(prim, primitive_type='xy'),
        primitive_line=dict(prim, primitive_type='line'),
        roi_head=dict(type='H3DRoIHead', mlp_channels=[32]))
    model = build_detector_from_cfg(cfg)
    batch = create_detector_inputs(batch_size=2, num_points=256, num_gt=4,
                                   num_classes=5)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert {'loss_flag_z', 'loss_center_xy', 'loss_flag_line',
            'loss_h3d_score', 'loss_h3d_refine'} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    preds = model.apply(variables, batch, mode='predict')
    assert np.isfinite(np.asarray(preds['bboxes'])).all()


def test_imvotenet_loss_and_predict():
    cfg = dict(
        type='ImVoteNet',
        backbone=BACKBONE,
        fusion_layer=dict(type='VoteFusion', num_classes=5),
        bbox_head=dict(type='VoteHead', num_classes=5,
                       in_channels=32 + 3 + 5 + 3, num_proposals=16,
                       agg_channels=(32, 32), max_num=8,
                       mean_sizes=[[1.0, 1.0, 1.0]] * 5))
    model = build_detector_from_cfg(cfg)
    rng = np.random.default_rng(0)
    B, M = 2, 6
    batch = create_detector_inputs(batch_size=B, num_points=256, num_gt=4,
                                   num_classes=5)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch['imgs'] = jnp.asarray(
        rng.normal(size=(B, 96, 128, 3)).astype(np.float32))
    x1 = rng.uniform(0, 100, (B, M)); y1 = rng.uniform(0, 70, (B, M))
    batch['bboxes_2d'] = jnp.asarray(np.stack(
        [x1, y1, x1 + 20, y1 + 20], -1).astype(np.float32))
    batch['scores_2d'] = jnp.asarray(
        rng.uniform(0.1, 1, (B, M)).astype(np.float32))
    batch['labels_2d'] = jnp.asarray(rng.integers(0, 5, (B, M)))
    batch['mask_2d'] = jnp.ones((B, M), bool)
    batch['cam2img'] = jnp.asarray(np.tile(np.array(
        [[100., 0, 64], [0, 100., 48], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    preds = model.apply(variables, batch, mode='predict')
    assert np.isfinite(np.asarray(preds['bboxes'])).all()
