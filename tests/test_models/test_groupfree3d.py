"""GroupFree3D: KPS candidate sampling + multi-stage transformer decoder
with per-stage losses and ensemble decode."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


def test_groupfree3d_loss_and_predict():
    cfg = dict(
        type='VoteNet',
        backbone=dict(type='PointNet2SASSG', in_channels=4,
                      num_points=(128, 64, 32, 16),
                      radius=(0.5, 1.0, 2.0, 4.0),
                      num_samples=(16, 16, 16, 16),
                      sa_channels=((16, 16), (32, 32), (32, 32), (32, 32)),
                      fp_channels=((32, 32), (32, 32))),
        bbox_head=dict(type='GroupFree3DHead', num_classes=5,
                       in_channels=32, hidden_channel=32,
                       num_proposals=16, num_decoder_layers=2,
                       num_heads=4, ffn_channel=64, max_num=8))
    model = build_detector_from_cfg(cfg)
    batch = create_detector_inputs(batch_size=2, num_points=256, num_gt=4,
                                   num_classes=5)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert {'loss_total', 'loss_sampling'} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape == (2, 8, 7)
    assert np.isfinite(np.asarray(preds['bboxes'])).all()
