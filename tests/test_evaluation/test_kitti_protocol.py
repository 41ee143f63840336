"""Golden tests for the official-protocol KITTI eval internals
(clean_data / compute_statistics / get_thresholds), hand-computed from the
reference semantics (ref mmdet3d kitti_utils/eval.py:9-294)."""
import numpy as np

from tpu_bev3d.evaluation.functional.kitti_eval import (
    clean_data, compute_statistics, get_thresholds, iou_2d_np,
    rotated_iou_bev_np, kitti_eval)


def _gt(boxes, labels, **kw):
    d = dict(boxes=np.asarray(boxes, np.float32).reshape(-1, 7),
             labels=np.asarray(labels), _class_idx=0)
    d.update({k: np.asarray(v) for k, v in kw.items()})
    return d


def test_clean_data_difficulty_buckets():
    g = _gt([[0, 0, 0, 4, 2, 1.5, 0]] * 4, [0, 0, 0, 0],
            names=['Car', 'Car', 'Van', 'Pedestrian'],
            occluded=[0, 2, 0, 0], truncated=[0.0, 0.4, 0.0, 0.0],
            bbox2d=[[0, 0, 50, 50], [0, 0, 50, 30], [0, 0, 50, 50],
                    [0, 0, 50, 50]])
    d = dict(boxes=np.zeros((0, 7), np.float32),
             labels=np.zeros(0, np.int64), scores=np.zeros(0))
    # easy (occ<=0, trunc<=.15, h>40): GT0 care; GT1 fails (occ 2, h 30);
    # Van = neighbor → ignored; Pedestrian = other class → -1
    n, ig, _, dc = clean_data(g, d, 'Car', 0)
    assert n == 1
    assert list(ig) == [0, 1, 1, -1]
    # hard (occ<=2, trunc<=.5, h>25): GT1 becomes care
    n, ig, _, _ = clean_data(g, d, 'Car', 2)
    assert n == 2
    assert list(ig) == [0, 0, 1, -1]
    assert not dc.any()


def test_compute_statistics_ignored_gt_absorbs_detection():
    """A detection matched to an ignored GT is neither TP nor FP."""
    gt = _gt([[0, 0, 0, 4, 2, 1.5, 0], [20, 0, 0, 4, 2, 1.5, 0]],
             [0, 0])
    dt = dict(boxes=np.asarray([[0.1, 0, 0, 4, 2, 1.5, 0],
                                [20.1, 0, 0, 4, 2, 1.5, 0]], np.float32),
              labels=np.array([0, 0]),
              scores=np.array([0.9, 0.8], np.float32))
    ov = rotated_iou_bev_np(dt['boxes'], gt['boxes'])
    ig_gt = np.array([0, 1])      # second GT ignored at this difficulty
    ig_dt = np.zeros(2, np.int32)
    tp, fp, fn, _, th = compute_statistics(
        ov, gt, dt, ig_gt, ig_dt, np.zeros(2, bool), 0.7, 0.5,
        compute_fp=True)
    assert (tp, fp, fn) == (1, 0, 0)


def test_compute_statistics_threshold_and_fn():
    gt = _gt([[0, 0, 0, 4, 2, 1.5, 0]], [0])
    dt = dict(boxes=np.asarray([[0.1, 0, 0, 4, 2, 1.5, 0]], np.float32),
              labels=np.array([0]), scores=np.array([0.3], np.float32))
    ov = rotated_iou_bev_np(dt['boxes'], gt['boxes'])
    # detection below the score threshold → the GT becomes a FN
    tp, fp, fn, _, _ = compute_statistics(
        ov, gt, dt, np.zeros(1, np.int32), np.zeros(1, np.int32),
        np.zeros(1, bool), 0.7, 0.5, compute_fp=True)
    assert (tp, fp, fn) == (0, 0, 1)


def test_dontcare_subtracts_2d_fp():
    """2D-bbox metric: an unmatched detection inside a DontCare region is
    removed from the FP count (ref :186-207)."""
    gt = _gt([[0, 0, 0, 4, 2, 1.5, 0]], [0],
             names=['Car'], bbox2d=[[0, 0, 60, 60]])
    dt = dict(boxes=np.asarray([[0.1, 0, 0, 4, 2, 1.5, 0],
                                [50, 50, 0, 4, 2, 1.5, 0]], np.float32),
              labels=np.array([0, 0]),
              scores=np.array([0.9, 0.8], np.float32),
              bbox2d=np.asarray([[0, 0, 60, 60], [100, 100, 160, 160]],
                                np.float32))
    ov = iou_2d_np(dt['bbox2d'], gt['bbox2d'])
    dc_box = np.asarray([[95, 95, 165, 165]], np.float32)
    dc_ov = iou_2d_np(dt['bbox2d'], dc_box)
    tp, fp, fn, _, _ = compute_statistics(
        ov, gt, dt, np.zeros(1, np.int32), np.zeros(2, np.int32),
        np.zeros(1, bool), 0.7, 0.5, compute_fp=True, metric=0,
        dc_overlaps=dc_ov)
    assert (tp, fp, fn) == (1, 0, 0)     # 2nd det absorbed by DontCare


def test_aos_similarity():
    gt = _gt([[0, 0, 0, 4, 2, 1.5, 0]], [0], alphas=[0.0],
             bbox2d=[[0, 0, 60, 60]], names=['Car'])
    dt = dict(boxes=np.asarray([[0.1, 0, 0, 4, 2, 1.5, 0]], np.float32),
              labels=np.array([0]), scores=np.array([0.9], np.float32),
              bbox2d=np.asarray([[0, 0, 60, 60]], np.float32),
              alphas=np.array([np.pi]))
    ov = iou_2d_np(dt['bbox2d'], gt['bbox2d'])
    tp, fp, fn, sim, _ = compute_statistics(
        ov, gt, dt, np.zeros(1, np.int32), np.zeros(1, np.int32),
        np.zeros(1, bool), 0.7, 0.5, compute_fp=True, compute_aos=True,
        metric=0)
    assert tp == 1
    # opposite orientation → similarity (1 + cos(pi)) / 2 = 0
    np.testing.assert_allclose(sim, 0.0, atol=1e-7)


def test_get_thresholds_recall_sampling():
    # 100 GT, 100 uniformly-scored TPs → thresholds every ~2.5 recall pts
    scores = np.linspace(1.0, 0.01, 100)
    th = get_thresholds(scores, 100)
    assert len(th) == 41  # one threshold per recall sample point
    assert th[0] == 1.0
    assert all(a > b for a, b in zip(th, th[1:]))


def test_difficulty_changes_ap():
    """A hard-only GT must contribute at hard but not at easy."""
    rng = np.random.default_rng(4)
    gt, pred = [], []
    for _ in range(20):
        n = 6
        ctr = rng.uniform(-40, 40, (n, 3))
        dims = rng.uniform(2, 4, (n, 3))
        yaw = rng.uniform(-np.pi, np.pi, (n, 1))
        b = np.concatenate([ctr, dims, yaw], -1).astype(np.float32)
        heights = np.where(np.arange(n) % 2 == 0, 50.0, 30.0)
        bb = np.stack([np.zeros(n), np.zeros(n),
                       np.full(n, 50.0), heights], -1)
        gt.append(dict(boxes=b, labels=np.zeros(n, np.int64),
                       names=['Car'] * n, occluded=np.zeros(n),
                       truncated=np.zeros(n), bbox2d=bb))
        pred.append(dict(boxes=b.copy(), labels=np.zeros(n, np.int64),
                         scores=rng.uniform(0.3, 1, n).astype(np.float32)))
    out = kitti_eval(pred, gt, ['Car'], metrics=('3d',))
    # easy sees half the GTs (the tall ones); predictions for the short
    # ones are absorbed by ignored GTs → still perfect precision
    assert out['Car_3d_easy_AP40'] > 95
    assert out['Car_3d_hard_AP40'] > 95
