"""Golden tests for the devkit-fidelity nuScenes eval: tiny scenarios
whose AP / TP-error / NDS values are computed BY HAND from the devkit
formulas (accumulate → 101-pt interp → calc_ap slice [11:] → calc_tp over
[11, max_recall_ind]) — not against the implementation itself."""
import numpy as np

from tpu_bev3d.evaluation.functional.nuscenes_eval import (
    DIST_THS, nuscenes_eval)

CLASSES = ['car']


def _boxes(rows):
    return np.asarray(rows, np.float32).reshape(-1, 9)


def test_single_perfect_tp_pins_all_terms():
    gt = [dict(boxes=_boxes([[0, 0, 0, 4, 2, 1.5, 0.5, 0, 0]]),
               labels=np.array([0]))]
    # pred: 0.3m off, same size, yaw off by 0.1, velocity (0.3, 0)
    pred = [dict(boxes=_boxes([[0.3, 0, 0, 4, 2, 1.5, 0.6, 0.3, 0]]),
                 labels=np.array([0]), scores=np.array([0.9]))]
    out = nuscenes_eval(pred, gt, CLASSES)
    # rec=[1], prec=[1] → interpolated precision 1 everywhere → AP = 1
    for th in DIST_THS:
        np.testing.assert_allclose(out[f'car_AP_dist_{th}'], 1.0,
                                   atol=1e-9)
    np.testing.assert_allclose(out['mAP'], 1.0, atol=1e-9)
    np.testing.assert_allclose(out['car_trans_err'], 0.3, atol=1e-6)
    np.testing.assert_allclose(out['car_scale_err'], 0.0, atol=1e-6)
    np.testing.assert_allclose(out['car_orient_err'], 0.1, atol=1e-5)
    np.testing.assert_allclose(out['car_vel_err'], 0.3, atol=1e-6)
    # pred speed 0.3 > 0.2 → 'vehicle.moving'; GT parked → attr error 1
    np.testing.assert_allclose(out['car_attr_err'], 1.0)
    # NDS = (5*1 + (1-.3) + (1-0) + (1-.1) + (1-.3) + (1-1)) / 10
    np.testing.assert_allclose(out['NDS'],
                               (5 + 0.7 + 1.0 + 0.9 + 0.7 + 0.0) / 10,
                               atol=1e-5)


def test_fp_before_tp_matches_hand_interp():
    gt = [dict(boxes=_boxes([[0, 0, 0, 4, 2, 1.5, 0, 0, 0]]),
               labels=np.array([0]))]
    pred = [dict(boxes=_boxes([
        [20, 0, 0, 4, 2, 1.5, 0, 0, 0],    # FP (20m off), higher score
        [0.2, 0, 0, 4, 2, 1.5, 0, 0, 0],   # TP, lower score
    ]), labels=np.array([0, 0]), scores=np.array([0.9, 0.8]))]
    out = nuscenes_eval(pred, gt, CLASSES)
    # rec=[0,1], prec=[0,0.5] → interpolated precision(r) = 0.5 r
    # AP = mean_{i=11..100} max(0.5*i/100 - 0.1, 0) / 0.9
    expect = np.mean([max(0.5 * i / 100 - 0.1, 0.0)
                      for i in range(11, 101)]) / 0.9
    for th in DIST_THS:
        np.testing.assert_allclose(out[f'car_AP_dist_{th}'], expect,
                                   atol=1e-9)


def test_class_range_filtering_drops_far_boxes():
    # far FP at 60 m (> car range 50) must be filtered out → perfect AP;
    # far GT also filtered → npos = 1
    gt = [dict(boxes=_boxes([[0, 0, 0, 4, 2, 1.5, 0, 0, 0],
                             [60, 0, 0, 4, 2, 1.5, 0, 0, 0]]),
               labels=np.array([0, 0]))]
    pred = [dict(boxes=_boxes([
        [0.1, 0, 0, 4, 2, 1.5, 0, 0, 0],
        [59.9, 0, 0, 4, 2, 1.5, 0, 0, 0],
    ]), labels=np.array([0, 0]), scores=np.array([0.9, 0.8]))]
    out = nuscenes_eval(pred, gt, CLASSES)
    np.testing.assert_allclose(out['car_AP_dist_0.5'], 1.0, atol=1e-9)
    out_nofilter = nuscenes_eval(pred, gt, CLASSES, filter_range=False)
    np.testing.assert_allclose(out_nofilter['car_AP_dist_0.5'], 1.0,
                               atol=1e-9)  # both kept, both match


def test_global_confidence_ordering_across_samples():
    """A high-score FP in sample 2 must precede a low-score TP in sample 1
    (devkit sorts predictions globally, not per sample)."""
    gt = [dict(boxes=_boxes([[0, 0, 0, 4, 2, 1.5, 0, 0, 0]]),
               labels=np.array([0])),
          dict(boxes=np.zeros((0, 9), np.float32),
               labels=np.zeros((0,), np.int64))]
    pred = [dict(boxes=_boxes([[0.2, 0, 0, 4, 2, 1.5, 0, 0, 0]]),
                 labels=np.array([0]), scores=np.array([0.5])),
            dict(boxes=_boxes([[5, 5, 0, 4, 2, 1.5, 0, 0, 0]]),
                 labels=np.array([0]), scores=np.array([0.9]))]
    out = nuscenes_eval(pred, gt, CLASSES)
    # same curve as the fp-before-tp case: precision(r) = 0.5 r
    expect = np.mean([max(0.5 * i / 100 - 0.1, 0.0)
                      for i in range(11, 101)]) / 0.9
    np.testing.assert_allclose(out['car_AP_dist_2.0'], expect, atol=1e-9)


def test_barrier_orientation_period_and_nan_metrics():
    classes = ['barrier']
    gt = [dict(boxes=_boxes([[0, 0, 0, 2, 0.5, 1, 0.0, 0, 0]]),
               labels=np.array([0]))]
    # yaw off by pi - 0.2 → with period pi the error is 0.2
    pred = [dict(boxes=_boxes([[0.1, 0, 0, 2, 0.5, 1, np.pi - 0.2, 0, 0]]),
                 labels=np.array([0]), scores=np.array([0.9]))]
    out = nuscenes_eval(pred, gt, classes)
    np.testing.assert_allclose(out['barrier_orient_err'], 0.2, atol=1e-5)
    assert np.isnan(out['barrier_attr_err'])
    assert np.isnan(out['barrier_vel_err'])
    # nan metrics contribute err=1 (score 0) to NDS per devkit fallback
    # here: mAP=1, trans .1, scale 0, orient .2 → NDS
    np.testing.assert_allclose(
        out['NDS'], (5 + 0.9 + 1.0 + 0.8 + 0.0 + 0.0) / 10, atol=1e-5)
