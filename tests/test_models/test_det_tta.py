"""Detection TTA (ref mmdet3d/models/test_time_augs/merge_augs.py):
mapping-back correctness, merge NMS dedup, and the Det3DTTAModel wrapper
on VoteNet (aug_test's reference user) + an anchor-head model."""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_bev3d.config import Config
from tpu_bev3d.models.test_time_augs import (bbox3d_mapping_back,
                                             merge_aug_bboxes_3d)
from tpu_bev3d.structures import boxes3d as B
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg


def test_mapping_back_inverts_flip_and_scale():
    rng = np.random.RandomState(0)
    boxes = rng.randn(6, 7).astype(np.float32)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.5
    # forward aug: h-flip then scale by s (points pipeline order)
    s = 1.05
    fwd = B.flip(boxes, 'horizontal', np)
    fwd = np.concatenate([fwd[:, :6] * s, fwd[:, 6:]], -1)
    back = np.asarray(bbox3d_mapping_back(jnp.asarray(fwd), s, True, False))
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], rtol=1e-5)
    # yaw equal modulo 2π
    dy = (back[:, 6] - boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dy, 0, atol=1e-5)


def test_merge_dedups_flipped_duplicates():
    """Two views of the SAME scene — identity + h-flip. After mapping
    back they coincide, so the merge must NMS them down to the identity
    set (ref merge_augs.py: concat → per-class NMS)."""
    rng = np.random.RandomState(1)
    M = 8
    boxes = np.zeros((M, 7), np.float32)
    boxes[:, 0] = np.arange(M) * 10.0          # well-separated
    boxes[:, 1] = rng.randn(M)
    boxes[:, 3:6] = 1.0
    scores = np.linspace(0.9, 0.3, M).astype(np.float32)
    labels = (np.arange(M) % 3).astype(np.int32)
    mask = np.ones(M, bool)
    r_id = dict(bboxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
                labels=jnp.asarray(labels), mask=jnp.asarray(mask))
    flipped = B.flip(boxes, 'horizontal', np)
    r_fl = dict(bboxes=jnp.asarray(flipped),
                scores=jnp.asarray(scores * 0.99),   # slightly lower
                labels=jnp.asarray(labels), mask=jnp.asarray(mask))
    merged = merge_aug_bboxes_3d(
        [r_id, r_fl],
        [dict(), dict(pcd_horizontal_flip=True)],
        num_classes=3, nms_thr=0.3, max_num=16)
    got = np.asarray(merged['mask'])
    assert got.sum() == M, f'expected {M} survivors, got {got.sum()}'
    kept = np.asarray(merged['bboxes'])[got]
    # the identity view's (higher-scoring) boxes survive
    assert np.allclose(sorted(kept[:, 0].tolist()),
                       sorted(boxes[:, 0].tolist()), atol=1e-4)


def _tiny_votenet_cfg():
    cfg = Config.fromfile('configs/votenet/votenet_sunrgbd.py')
    m = cfg.model
    m.backbone.num_points = (64, 32, 16, 8)
    m.backbone.num_samples = (8, 8, 4, 4)
    m.backbone.sa_channels = ((16, 16), (16, 16), (16, 16), (16, 16))
    m.backbone.fp_channels = ((16, 16), (16, 16))
    m.bbox_head.in_channels = 16
    m.bbox_head.num_proposals = 8
    m.bbox_head.agg_channels = (16, 16)
    m.bbox_head.agg_num_sample = 4
    m.bbox_head.max_num = 8
    return m


def test_det3d_tta_votenet():
    from tpu_bev3d.registry import MODELS
    det_cfg = dict(_tiny_votenet_cfg())
    tta = MODELS.build(dict(type='Det3DTTAModel', detector=det_cfg,
                            num_classes=10, max_num=8,
                            views=((False, False, 1.0),
                                   (True, False, 1.0),
                                   (False, True, 1.0))))
    batch = create_detector_inputs(batch_size=2, num_points=128, num_gt=3,
                                   num_classes=10,
                                   pc_range=(-4, -4, -2, 4, 4, 2))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = tta.init(jax.random.PRNGKey(0), batch, mode='predict')
    preds = jax.jit(
        lambda v, b: tta.apply(v, b, mode='predict'))(variables, batch)
    assert preds['bboxes'].shape == (2, 8, 7)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
    # loss mode passes through to the wrapped detector
    losses = tta.apply(variables, batch, mode='loss')
    assert 'vote_loss' in losses


def test_det3d_tta_anchor_head_model():
    """Anchor-head user (ref anchor3d_head.py aug_test): PointPillars."""
    from tpu_bev3d.registry import MODELS
    cfg = Config.fromfile('configs/pointpillars/pointpillars_kitti_3class.py')
    m = cfg.model
    m.voxel_encoder.feat_channels = (16,)
    m.backbone.layer_nums = (1, 1, 1)
    m.backbone.out_channels = (16, 16, 16)
    m.neck.out_channels = (16, 16, 16)
    m.bbox_head.in_channels = 48
    m.bbox_head.feat_channels = 48
    m.max_voxels = 128
    tta = MODELS.build(dict(type='Det3DTTAModel', detector=dict(m),
                            num_classes=3, max_num=16))
    batch = create_detector_inputs(batch_size=1, num_points=256, num_gt=3,
                                   num_classes=3,
                                   pc_range=tuple(m.point_cloud_range))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = tta.init(jax.random.PRNGKey(0), batch, mode='predict')
    preds = tta.apply(variables, batch, mode='predict')
    assert preds['bboxes'].shape[1] == 16
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
