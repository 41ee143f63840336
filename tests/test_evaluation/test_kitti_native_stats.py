"""Native C++ KITTI statistics kernel ≡ the pure-Python oracle."""
import numpy as np
import pytest

import importlib

# the functional package re-exports the kitti_eval FUNCTION under the
# module's name, shadowing attribute access — resolve via sys.modules
KE = importlib.import_module('tpu_bev3d.evaluation.functional.kitti_eval')
KN = importlib.import_module(
    'tpu_bev3d.evaluation.functional.kitti_native')

pytestmark = pytest.mark.skipif(not KN.available(),
                                reason='no C++ toolchain')


def _frames(seed=0, n_frames=6):
    rng = np.random.default_rng(seed)
    preds, gts = [], []
    names_pool = ['Car', 'Pedestrian', 'Van', 'DontCare']
    for _ in range(n_frames):
        n_gt = rng.integers(1, 8)
        n_dt = rng.integers(0, 10)
        gtb = np.zeros((n_gt, 7), np.float32)
        gtb[:, :2] = rng.uniform(0, 40, (n_gt, 2))
        gtb[:, 2] = -1
        gtb[:, 3:6] = rng.uniform(1, 4, (n_gt, 3))
        names = [names_pool[i] for i in rng.integers(0, 4, n_gt)]
        gts.append(dict(
            boxes=gtb, labels=np.zeros(n_gt, np.int64),
            names=np.asarray(names),
            bbox2d=np.abs(rng.normal(size=(n_gt, 4))) * 50
            + np.asarray([0, 0, 60, 60]),
            occluded=rng.integers(0, 3, n_gt),
            truncated=rng.uniform(0, 0.6, n_gt).astype(np.float32),
            alphas=rng.uniform(-np.pi, np.pi, n_gt).astype(np.float32)))
        # detections near some GTs
        dtb = gtb[rng.integers(0, n_gt, n_dt)].copy()
        dtb[:, :2] += rng.normal(0, 1.0, (n_dt, 2))
        preds.append(dict(
            boxes=dtb, labels=np.zeros(n_dt, np.int64),
            scores=rng.uniform(0.1, 1.0, n_dt).astype(np.float32),
            bbox2d=np.abs(rng.normal(size=(n_dt, 4))) * 50
            + np.asarray([0, 0, 60, 60]),
            alphas=rng.uniform(-np.pi, np.pi, n_dt).astype(np.float32)))
    return preds, gts


@pytest.mark.parametrize('metric', ['bbox', 'bev', '3d'])
def test_native_matches_python(metric, monkeypatch):
    preds, gts = _frames()
    kw = dict(class_name='Car', class_idx=0, difficulty=1, metric=metric,
              min_overlap=0.5, compute_aos=(metric == 'bbox'))
    r_native = KE.eval_class(preds, gts, **kw)
    monkeypatch.setattr(KN, '_lib', None)
    monkeypatch.setattr(KN, '_tried', True)     # force Python fallback
    r_python = KE.eval_class(preds, gts, **kw)
    assert (r_native is None) == (r_python is None)
    if r_native is not None:
        np.testing.assert_allclose(r_native['precision'],
                                   r_python['precision'], atol=1e-9)
        np.testing.assert_allclose(r_native['aos'], r_python['aos'],
                                   atol=1e-9)


def test_full_kitti_eval_with_native(monkeypatch):
    preds, gts = _frames(seed=3)
    out_n = KE.kitti_eval(preds, gts, classes=['Car'],
                          metrics=('bbox', 'bev', '3d'),
                          compute_aos=True)
    monkeypatch.setattr(KN, '_lib', None)
    monkeypatch.setattr(KN, '_tried', True)
    out_p = KE.kitti_eval(preds, gts, classes=['Car'],
                          metrics=('bbox', 'bev', '3d'),
                          compute_aos=True)
    assert set(out_n) == set(out_p)
    for k in out_n:
        np.testing.assert_allclose(out_n[k], out_p[k], atol=1e-9,
                                   err_msg=k)
