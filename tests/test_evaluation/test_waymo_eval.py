"""Native Waymo protocol goldens: LEVEL difficulty split, APH heading
weighting, LET longitudinal tolerance."""
import numpy as np

from tpu_bev3d.evaluation.functional.waymo_eval import waymo_eval


def _sample(boxes, labels, scores=None, num_pts=None):
    d = dict(boxes=np.asarray(boxes, np.float32).reshape(-1, 7),
             labels=np.asarray(labels))
    if scores is not None:
        d['scores'] = np.asarray(scores, np.float32)
    if num_pts is not None:
        d['num_pts'] = np.asarray(num_pts)
    return d


def test_level_split_and_perfect_ap():
    # 2 GT: one well-observed (L1), one with 3 points (L2-only)
    gt = [_sample([[0, 0, 0, 4, 2, 1.5, 0], [10, 0, 0, 4, 2, 1.5, 0]],
                  [0, 0], num_pts=[50, 3])]
    pred = [_sample([[0, 0, 0, 4, 2, 1.5, 0], [10, 0, 0, 4, 2, 1.5, 0]],
                    [0, 0], scores=[0.9, 0.8])]
    out = waymo_eval(pred, gt, ['Car'])
    assert out['Car_LEVEL_1_AP'] == 1.0     # L2 GT excluded from npos
    assert out['Car_LEVEL_2_AP'] == 1.0
    assert out['LEVEL_2_mAPH'] == 1.0


def test_aph_penalizes_flipped_heading():
    gt = [_sample([[0, 0, 0, 4, 2, 1.5, 0]], [0], num_pts=[50])]
    pred = [_sample([[0, 0, 0, 4, 2, 1.5, np.pi]], [0], scores=[0.9])]
    out = waymo_eval(pred, gt, ['Car'])
    assert out['Car_LEVEL_2_AP'] == 1.0
    assert out['Car_LEVEL_2_APH'] < 0.05    # heading accuracy 0


def test_let_tolerates_longitudinal_error():
    # GT at 20 m; camera-style depth error pushes the pred to 21.5 m
    # (7.5% > not matched by strict IoU 0.7, but inside the 10% LET band)
    gt = [_sample([[20, 0, 0, 4, 2, 1.5, 0]], [0], num_pts=[50])]
    pred = [_sample([[21.5, 0, 0, 4, 2, 1.5, 0]], [0], scores=[0.9])]
    strict = waymo_eval(pred, gt, ['Car'])
    let = waymo_eval(pred, gt, ['Car'], let=True)
    assert strict['Car_LEVEL_2_AP'] == 0.0
    assert let['Car_LET_LEVEL_2_AP'] == 1.0
    # affinity = 1 - 1.5/2.0 = 0.25
    np.testing.assert_allclose(let['Car_LET_LEVEL_2_APL'], 0.25,
                               atol=1e-6)


def test_beyond_let_tolerance_is_fp():
    gt = [_sample([[20, 0, 0, 4, 2, 1.5, 0]], [0], num_pts=[50])]
    pred = [_sample([[23.0, 0, 0, 4, 2, 1.5, 0]], [0], scores=[0.9])]
    let = waymo_eval(pred, gt, ['Car'], let=True)
    assert let['Car_LET_LEVEL_2_AP'] == 0.0
