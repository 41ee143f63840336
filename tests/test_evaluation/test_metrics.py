"""Evaluation metric tests on synthetic predictions (pattern: ref
tests/test_evaluation/test_metrics — metrics run end-to-end on fabricated
outputs; perfect predictions must score perfectly)."""
import numpy as np

from tpu_bev3d.evaluation.functional.kitti_eval import (iou_3d_np,
                                                        kitti_eval,
                                                        rotated_iou_bev_np)
from tpu_bev3d.evaluation.functional.nuscenes_eval import nuscenes_eval
from tpu_bev3d.evaluation import KittiMetric, NuScenesMetric


def _boxes(n, rng, box_dim=7):
    ctr = rng.uniform(-40, 40, (n, 3))
    dims = rng.uniform(1, 4, (n, 3))
    yaw = rng.uniform(-np.pi, np.pi, (n, 1))
    parts = [ctr, dims, yaw]
    if box_dim == 9:
        parts.append(rng.uniform(-2, 2, (n, 2)))
    return np.concatenate(parts, -1).astype(np.float32)


def test_perfect_predictions_nuscenes():
    rng = np.random.default_rng(0)
    samples_gt, samples_pred = [], []
    for _ in range(4):
        b = _boxes(6, rng, 9)
        l = rng.integers(0, 10, 6)
        samples_gt.append(dict(boxes=b, labels=l))
        samples_pred.append(dict(boxes=b.copy(), labels=l.copy(),
                                 scores=np.full(6, 0.9, np.float32)))
    out = nuscenes_eval(samples_pred, samples_gt,
                        ['car', 'truck', 'construction_vehicle', 'bus',
                         'trailer', 'barrier', 'motorcycle', 'bicycle',
                         'pedestrian', 'traffic_cone'])
    assert out['mAP'] > 0.95
    assert out['NDS'] > 0.95
    assert out['mtrans_err'] < 1e-5


def test_shifted_predictions_lower_score():
    rng = np.random.default_rng(1)
    gt, pred = [], []
    for _ in range(4):
        b = _boxes(5, rng, 9)
        l = np.zeros(5, np.int64)
        gt.append(dict(boxes=b, labels=l))
        shifted = b.copy()
        shifted[:, :2] += 1.5  # between thresholds 1.0 and 2.0
        pred.append(dict(boxes=shifted, labels=l.copy(),
                         scores=np.full(5, 0.9, np.float32)))
    out = nuscenes_eval(pred, gt, ['car'])
    assert out['car_AP_dist_0.5'] < 0.05
    assert out['car_AP_dist_4.0'] > 0.9
    assert 0 < out['mAP'] < 0.9


def test_rotated_iou_np_identity():
    b = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], np.float32)
    assert abs(rotated_iou_bev_np(b, b)[0, 0] - 1.0) < 1e-5
    assert abs(iou_3d_np(b, b)[0, 0] - 1.0) < 1e-4
    b2 = b.copy()
    b2[0, 0] += 100
    assert rotated_iou_bev_np(b, b2)[0, 0] < 1e-6


def test_kitti_eval_perfect():
    """Perfect predictions with ENOUGH objects: the official 41-point
    protocol (ref eval.py get_thresholds) needs ≥41 TPs per class to fill
    every recall sample point — with fewer, trailing precision slots stay
    0 by design, so tiny fixtures cannot reach AP 100."""
    rng = np.random.default_rng(2)
    gt, pred = [], []
    for _ in range(15):
        b = _boxes(12, rng)
        l = rng.integers(0, 3, 12)
        gt.append(dict(boxes=b, labels=l))
        pred.append(dict(boxes=b.copy(), labels=l.copy(),
                         scores=rng.uniform(0.3, 1.0, 12)
                         .astype(np.float32)))
    out = kitti_eval(pred, gt, ['Pedestrian', 'Cyclist', 'Car'])
    assert out['m3d_AP40'] > 95, out['m3d_AP40']
    assert out['mbev_AP40'] > 95, out['mbev_AP40']


def test_metric_process_contract():
    """Fixed-shape device outputs → process() → compute_metrics()."""
    m = NuScenesMetric()
    B, N, G = 2, 8, 4
    rng = np.random.default_rng(3)
    boxes = _boxes(B * N, rng, 9).reshape(B, N, 9)
    preds = dict(bboxes=boxes,
                 scores=rng.uniform(0, 1, (B, N)).astype(np.float32),
                 labels=rng.integers(0, 10, (B, N)),
                 mask=np.ones((B, N), bool))
    batch = dict(gt_bboxes_3d=boxes[:, :G],
                 gt_labels_3d=preds['labels'][:, :G],
                 gt_mask=np.ones((B, G), bool))
    m.process(preds, batch)
    out = m.compute_metrics()
    assert 'NDS' in out and 'mAP' in out
    assert np.isfinite(out['NDS'])
