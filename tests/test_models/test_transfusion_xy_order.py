"""TransFusion head xy-order consistency: decode and heatmap targets must
agree on which BEV cell corresponds to which world (x, y) — an asymmetric
grid catches any row/col swap (the head follows the reference's xy-order
BEV layout, rows = x bins)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_bev3d.models.dense_heads.transfusion_head import BEVFusionHead


def make_head():
    return BEVFusionHead(
        num_classes=3, in_channels=16, hidden_channel=16,
        num_proposals=4, num_heads=2, ffn_channel=32,
        point_cloud_range=(-10., -5., -3., 10., 5., 3.),
        voxel_size=(0.5, 0.5, 0.2), out_size_factor=1,
        with_velocity=False, code_size=8)


def test_decode_maps_rows_to_x():
    head = make_head()
    H, W = 40, 20        # rows = x bins (40), cols = y bins (20)
    x = jnp.zeros((1, H, W, 16))
    variables = head.init(jax.random.PRNGKey(0), x)

    res = head.apply(variables, x)
    # force a known query position: center (row=30, col=5) + zero offsets
    res = dict(res)
    res['center'] = jnp.array([[[30.0, 5.0]] * res['center'].shape[1]])
    res['height'] = jnp.zeros_like(res['height'])
    bboxes, _, _ = head.apply(variables, res, method=head.decode)
    # x = 30*0.5 - 10 = 5.0 ; y = 5*0.5 - 5 = -2.5
    np.testing.assert_allclose(np.asarray(bboxes[0, 0, 0]), 5.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bboxes[0, 0, 1]), -2.5, atol=1e-5)


def test_heatmap_target_peak_matches_decode_cell():
    head = make_head()
    H, W = 40, 20
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 16))
    variables = head.init(jax.random.PRNGKey(0), x)
    res = head.apply(variables, x)

    gtb = jnp.array([[[5.0, -2.5, 0.0, 2.0, 1.0, 1.5, 0.3, 0.0]]])
    gtl = jnp.array([[1]], jnp.int32)
    gtm = jnp.array([[True]])
    losses, hm_tgt = head.apply(
        variables, res, gtb, gtl, gtm,
        method=lambda m, r, b, l, k: (m.loss_by_feat(r, b, l, k),
                                      m._heatmap_targets(b, l, k, H, W)))
    peak = np.unravel_index(
        np.asarray(hm_tgt[0, :, :, 1]).argmax(), (H, W))
    assert peak == (30, 5), peak       # row 30 = x bin, col 5 = y bin
    for v in losses.values():
        assert np.isfinite(float(v))
