"""Part-A² end-to-end: SparseUNet + seg/part supervision + part-
aggregation RoI refinement (loss + predict on synthetic inputs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


@pytest.fixture(scope='module')
def small_cfg():
    cfg = Config.fromfile('configs/parta2/parta2_kitti_3class.py')
    m = cfg.model
    m.voxel_size = [0.55, 0.625, 0.0976]
    m.max_voxels = 512
    m.max_num_points = 4
    m.middle_encoder.sparse_shape = [41, 128, 128]
    m.middle_encoder.base_channels = 8
    m.middle_encoder.encoder_channels = [[8], [16, 16], [32, 32], [32, 32]]
    m.middle_encoder.encoder_paddings = [[1], [1, 1], [1, 1],
                                         [[0, 1, 1], 1]]
    m.middle_encoder.decoder_channels = [[32, 32, 32], [32, 32, 16],
                                         [16, 16, 8], [8, 8, 8]]
    m.middle_encoder.decoder_paddings = [[1, 0], [1, 0], [0, 0], [0, 1]]
    m.middle_encoder.output_channels = 32
    m.backbone.in_channels = 64
    m.backbone.layer_nums = [2, 2]
    m.backbone.out_channels = [32, 64]
    m.neck.in_channels = [32, 64]
    m.neck.out_channels = [32, 32]
    m.rpn_head.in_channels = 64
    m.rpn_head.feat_channels = 64
    m.rpn_head.nms_pre = 64
    m.rpn_head.max_num = 16
    m.seg_head.in_channels = 8
    m.roi_head.seg_channels = 8
    m.roi_head.grid_size = 6
    m.roi_head.conv_channels = [16, 16]
    m.roi_head.fc_channels = [32]
    m.roi_head.voxel_size = m.voxel_size
    return cfg


def test_parta2_loss_and_predict(small_cfg):
    model = build_detector_from_cfg(small_cfg.model)
    batch = create_detector_inputs(batch_size=2, num_points=512, num_gt=4)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    expected = {'rpn_loss_cls', 'rpn_loss_bbox', 'rpn_loss_dir',
                'loss_semantic', 'loss_part', 'loss_rcnn_reg',
                'loss_rcnn_cls'}
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)

    preds = model.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape[:2] == (2, 16)
    assert np.isfinite(np.asarray(preds['bboxes'])).all()


def test_roi_aware_pool_places_features():
    from tpu_bev3d.models.roi_heads import roi_aware_pool
    xyz = jnp.asarray([[1.0, 0.0, 0.5], [100.0, 0.0, 0.5]])
    feats = jnp.asarray([[2.0], [7.0]])
    valid = jnp.asarray([True, True])
    rois = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 1.0, 0.0]])
    out = roi_aware_pool(xyz, feats, valid, rois, grid_size=4, mode='max')
    # point (1, 0, .5): local x=1 → part 0.75 → cell 3; y → cell 2; z 0.5
    # → cell 2
    assert float(out[0, 3, 2, 2, 0]) == 2.0
    assert float(jnp.sum(out)) == 2.0      # far point excluded
    out_avg = roi_aware_pool(xyz, feats, valid, rois, grid_size=4,
                             mode='avg')
    assert float(out_avg[0, 3, 2, 2, 0]) == 2.0


def test_parta2_roi_sampler_option(small_cfg):
    """with_roi_sampler restricts the RCNN loss to a sampled RoI subset
    (IoUNegPiecewiseSampler, ref train_cfg sampler) — runs finite."""
    import copy
    cfg = copy.deepcopy(small_cfg)
    cfg.model.roi_head.with_roi_sampler = True
    cfg.model.roi_head.roi_sampler = dict(
        num=8, pos_fraction=0.5, neg_piece_fractions=[0.8, 0.2],
        neg_iou_piece_thrs=[0.55, 0.1])
    model = build_detector_from_cfg(cfg.model)
    batch = create_detector_inputs(batch_size=2, num_points=512, num_gt=4)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert 'loss_rcnn_cls' in losses


def test_roi_pruned_pool_matches_exact():
    """roi_candidates pruning (top-K-nearest superset) reproduces the
    all-pairs pool exactly when K covers every box's member count."""
    from tpu_bev3d.models.roi_heads import (roi_aware_pool,
                                            roi_aware_pool_pruned,
                                            roi_candidate_select)
    rng = np.random.default_rng(0)
    V, R, C, G = 400, 12, 5, 6
    xyz = jnp.asarray(rng.uniform(-10, 10, (V, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((V, C)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=V) > 0.1)
    rois = jnp.asarray(np.concatenate([
        rng.uniform(-8, 8, (R, 2)), rng.uniform(-2, 0, (R, 1)),
        rng.uniform(2, 6, (R, 3)), rng.uniform(-3, 3, (R, 1))],
        -1).astype(np.float32))
    idx, cv = roi_candidate_select(xyz, valid, rois, num_candidates=V)
    for mode in ('max', 'avg'):
        exact = roi_aware_pool(xyz, feats, valid, rois, G, mode)
        pruned = roi_aware_pool_pruned(xyz, feats, valid, rois, G, mode,
                                       idx, cv)
        np.testing.assert_allclose(np.asarray(pruned), np.asarray(exact),
                                   rtol=1e-5, atol=1e-5)
    # K < V still exact when every member is among the K nearest
    idx2, cv2 = roi_candidate_select(xyz, valid, rois, num_candidates=128)
    # count members per roi to confirm the premise holds in this fixture
    from tpu_bev3d.models.roi_heads.part_aggregation_roi_head import \
        points_in_boxes_local
    _, inside = points_in_boxes_local(xyz, rois)
    inside = np.asarray(inside & valid[:, None])
    d2 = np.sum((np.asarray(xyz)[:, None]
                 - (np.asarray(rois[:, :3])
                    + np.array([0, 0, 1])[None]
                    * np.asarray(rois[:, 5:6]) / 2)[None]) ** 2, -1)
    kth = np.sort(np.where(np.asarray(valid)[:, None], d2, np.inf),
                  0)[127]
    assert (np.where(inside, d2, -np.inf) <= kth[None]).all()
    for mode in ('max', 'avg'):
        exact = roi_aware_pool(xyz, feats, valid, rois, G, mode)
        pruned = roi_aware_pool_pruned(xyz, feats, valid, rois, G, mode,
                                       idx2, cv2)
        np.testing.assert_allclose(np.asarray(pruned), np.asarray(exact),
                                   rtol=1e-5, atol=1e-5)
