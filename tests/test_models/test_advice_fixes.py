"""Regression tests for round-1 advisor findings (ADVICE.md):

1. legacy pillar decoration must overwrite raw xyz with pillar-center
   offsets (ref pillar_encoder.py:130-142 in-place view semantics).
2. Anchor3DHead with one shared anchor size + num_classes>1 must fall
   back to class-agnostic assignment (pointpillars_nus.py config) —
   positives must exist, bbox loss must be nonzero.
3. FreeAnchor loss follows the reference algorithm (exp(-smooth_l1) box
   likelihood, 1/(1-p)-normalized bag weights, focal on
   cls_prob*(1-box_prob)).
"""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_bev3d.models.voxel_encoders.pillar_encoder import decorate_pillars


def _ref_decorate_legacy(voxels, num_points, coords, voxel_size, pcr):
    """Reference formula (torch pillar_encoder.py forward, legacy=True),
    re-derived in numpy with explicit in-place mutation."""
    V, T, C = voxels.shape
    features = voxels.copy()
    ls = [features]  # views: mutation below shows up here
    mask = np.arange(T)[None, :] < num_points[:, None]
    # cluster center (computed from raw xyz, before mutation)
    mean = voxels[..., :3].sum(1, keepdims=True) \
        / np.maximum(num_points, 1)[:, None, None]
    f_cluster = voxels[..., :3] - mean
    ls.append(f_cluster)
    # pillar center offsets, written IN PLACE into features[..., :3]
    vx, vy, vz = voxel_size
    features[..., 0] -= coords[:, 3][:, None] * vx + (vx / 2 + pcr[0])
    features[..., 1] -= coords[:, 2][:, None] * vy + (vy / 2 + pcr[1])
    features[..., 2] -= coords[:, 1][:, None] * vz + (vz / 2 + pcr[2])
    ls.append(features[..., :3].copy())
    out = np.concatenate(ls, -1)
    return out * mask[..., None]


def test_legacy_pillar_decoration_matches_reference_formula():
    rng = np.random.RandomState(0)
    V, T = 16, 8
    voxels = rng.randn(V, T, 4).astype(np.float32)
    num_points = rng.randint(1, T + 1, size=(V,)).astype(np.int32)
    # the voxelizer zero-pads beyond num_points (ops/voxelize.py contract;
    # the reference's CUDA hard_voxelize does the same)
    voxels *= (np.arange(T)[None, :] < num_points[:, None])[..., None]
    coords = np.stack([np.zeros(V), np.zeros(V),
                       rng.randint(0, 400, V), rng.randint(0, 400, V)],
                      1).astype(np.int32)
    vs = (0.25, 0.25, 8.0)
    pcr = (-50., -50., -5., 50., 50., 3.)
    got, _ = decorate_pillars(
        jnp.asarray(voxels), jnp.asarray(num_points), jnp.asarray(coords),
        voxel_size=vs, point_cloud_range=pcr, legacy=True)
    want = _ref_decorate_legacy(voxels, num_points, coords, vs, pcr)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    # layout sanity: first 3 channels are center offsets, NOT raw xyz
    assert not np.allclose(np.asarray(got)[..., :3],
                           voxels[..., :3] * (np.arange(T)[None, :, None]
                                              < num_points[:, None, None]))


def test_nonlegacy_keeps_raw_xyz():
    rng = np.random.RandomState(1)
    voxels = rng.randn(4, 4, 4).astype(np.float32)
    num_points = np.full((4,), 4, np.int32)
    coords = np.zeros((4, 4), np.int32)
    got, _ = decorate_pillars(
        jnp.asarray(voxels), jnp.asarray(num_points), jnp.asarray(coords),
        voxel_size=(0.25, 0.25, 8.0),
        point_cloud_range=(-50., -50., -5., 50., 50., 3.), legacy=False)
    np.testing.assert_allclose(np.asarray(got)[..., :3], voxels[..., :3],
                               rtol=1e-6)


def test_shared_size_anchor_head_gets_positives():
    """pointpillars_nus.py shape: 1 shared size, 10 classes. Before the
    fix every anchor had class -1 and no positive was ever selected."""
    from tpu_bev3d.models.dense_heads.anchor3d_head import Anchor3DHead

    head = Anchor3DHead(
        num_classes=10, in_channels=32, feat_channels=32, box_code_size=9,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[[-49.6, -49.6, -1.80, 49.6, 49.6, -1.80]],
            sizes=[[4.6, 1.95, 1.72]], rotations=[0, 1.57],
            size_per_range=False),
        assigner_cfgs=[dict(pos_iou_thr=0.6, neg_iou_thr=0.3,
                            min_pos_iou=0.3)] * 10)
    B, H, W = 1, 20, 20
    x = jax.random.normal(jax.random.PRNGKey(7), (B, H, W, 32))
    variables = head.init(jax.random.PRNGKey(0), x)
    outs = head.apply(variables, x)
    # one GT sitting exactly on an anchor position/size → IoU 1 with the
    # rot-0 anchor there (aligned grid spacing 99.2/20 = 4.96; centers at
    # -49.6 + 2.48 + k*4.96 → 2.48 for k=10)
    gtb = jnp.array([[[2.48, 2.48, -1.80, 4.6, 1.95, 1.72, 0.0, 0., 0.]]])
    gtl = jnp.array([[2]], jnp.int32)
    gtm = jnp.array([[True]])
    losses = head.apply(variables, outs, gtb, gtl, gtm,
                        method=head.loss_by_feat)
    assert float(losses['loss_bbox']) > 0.0, losses
    assert np.isfinite(float(losses['loss_cls']))


def test_free_anchor_loss_reference_semantics():
    from tpu_bev3d.models.dense_heads.free_anchor3d_head import \
        FreeAnchor3DHead

    head = FreeAnchor3DHead(
        num_classes=3, in_channels=16, feat_channels=16,
        pre_anchor_topk=8,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[[-10, -10, -1.8, 10, 10, -1.8]],
            sizes=[[4.6, 1.95, 1.72], [1.8, 0.6, 1.7], [0.8, 0.8, 1.9]],
            rotations=[0, 1.57]))
    B, H, W = 2, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 16))
    variables = head.init(jax.random.PRNGKey(0), x)
    outs = head.apply(variables, x)
    gtb = jnp.tile(jnp.array([[[1.0, 1.0, -1.8, 4.5, 1.9, 1.7, 0.3]]]),
                   (B, 2, 1))
    gtl = jnp.zeros((B, 2), jnp.int32)
    gtm = jnp.array([[True, False], [True, True]])
    losses = head.apply(variables, outs, gtb, gtl, gtm,
                        method=head.loss_by_feat)
    pos = float(losses['positive_bag_loss'])
    neg = float(losses['negative_bag_loss'])
    assert np.isfinite(pos) and pos > 0
    assert np.isfinite(neg) and neg > 0

    # gradients flow to the inputs through both terms
    def total(o):
        l = head.apply(variables, o, gtb, gtl, gtm,
                       method=head.loss_by_feat)
        return l['positive_bag_loss'] + l['negative_bag_loss']
    g = jax.grad(lambda o: total(o))(outs)
    assert float(jnp.sum(jnp.abs(g[0]))) > 0  # cls grads
    assert float(jnp.sum(jnp.abs(g[1]))) > 0  # bbox grads
