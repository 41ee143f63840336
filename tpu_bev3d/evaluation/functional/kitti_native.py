"""ctypes binding for the native KITTI-eval statistics kernel
(csrc/kitti_stats.cc — the reference's numba compute_statistics_jit /
fused_compute_statistics equivalent). Auto-builds with g++; callers fall
back to the pure-Python loop when unavailable."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'csrc')
_LIB_PATH = os.path.join(_CSRC, 'libkittistats.so')
_lib = None
_tried = False

_f32p = ctypes.POINTER(ctypes.c_float)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_f64p = ctypes.POINTER(ctypes.c_double)


def _load_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # Always invoke make (mtime no-op when current) so .cc edits are
    # never shadowed by a stale binary.
    try:
        subprocess.run(['make', '-C', _CSRC], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.kitti_collect_tp_scores.restype = ctypes.c_int32
    lib.kitti_collect_tp_scores.argtypes = [
        _f32p, ctypes.c_int32, ctypes.c_int32, _f32p, _i32p, _i32p,
        ctypes.c_float, _f32p]
    lib.kitti_accumulate_stats.restype = None
    lib.kitti_accumulate_stats.argtypes = [
        _f32p, ctypes.c_int32, ctypes.c_int32, _f32p, _f32p, _f32p,
        _i32p, _i32p, _f32p, ctypes.c_int32, ctypes.c_float, _f64p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _i64p, _i64p,
        _i64p, _f64p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load_lib() is not None


def collect_tp_scores(overlaps, dt_scores, ignored_gt, ignored_dt,
                      min_overlap) -> np.ndarray:
    lib = _load_lib()
    n_dt, n_gt = overlaps.shape if overlaps.size else (len(ignored_dt),
                                                      len(ignored_gt))
    out = np.empty((max(n_gt, 1),), np.float32)
    # hold refs to every converted array for the duration of the call
    ov = np.ascontiguousarray(overlaps, np.float32)
    sc = np.ascontiguousarray(dt_scores, np.float32)
    ig = np.ascontiguousarray(ignored_gt, np.int32)
    idt = np.ascontiguousarray(ignored_dt, np.int32)
    n = lib.kitti_collect_tp_scores(
        ov.ctypes.data_as(_f32p), n_dt, n_gt,
        sc.ctypes.data_as(_f32p), ig.ctypes.data_as(_i32p),
        idt.ctypes.data_as(_i32p), float(min_overlap),
        out.ctypes.data_as(_f32p))
    return out[:n].copy()


def accumulate_stats(overlaps, dt_scores, gt_alphas, dt_alphas,
                     ignored_gt, ignored_dt, dc_overlaps,
                     min_overlap, thresholds, compute_aos, metric,
                     tp, fp, fn, sim) -> None:
    """Accumulates into tp/fp/fn/sim (int64/int64/int64/float64 arrays of
    len(thresholds)) for ONE frame across ALL thresholds."""
    lib = _load_lib()
    n_dt, n_gt = overlaps.shape if overlaps.size else (len(ignored_dt),
                                                      len(ignored_gt))
    ov = np.ascontiguousarray(overlaps, np.float32)
    sc = np.ascontiguousarray(dt_scores, np.float32)
    ig = np.ascontiguousarray(ignored_gt, np.int32)
    idt = np.ascontiguousarray(ignored_dt, np.int32)
    th = np.ascontiguousarray(thresholds, np.float64)
    if dc_overlaps is not None and dc_overlaps.size:
        dc = np.ascontiguousarray(dc_overlaps, np.float32)
        dcp, n_dc = dc.ctypes.data_as(_f32p), dc.shape[1]
    else:
        dc, dcp, n_dc = None, _f32p(), 0
    if compute_aos:
        ga = np.ascontiguousarray(gt_alphas, np.float32)
        da = np.ascontiguousarray(dt_alphas, np.float32)
        gap, dap = ga.ctypes.data_as(_f32p), da.ctypes.data_as(_f32p)
    else:
        ga = da = None
        gap, dap = _f32p(), _f32p()
    lib.kitti_accumulate_stats(
        ov.ctypes.data_as(_f32p), n_dt, n_gt,
        sc.ctypes.data_as(_f32p), gap, dap,
        ig.ctypes.data_as(_i32p), idt.ctypes.data_as(_i32p), dcp, n_dc,
        float(min_overlap), th.ctypes.data_as(_f64p), len(th),
        int(compute_aos), int(metric),
        tp.ctypes.data_as(_i64p), fp.ctypes.data_as(_i64p),
        fn.ctypes.data_as(_i64p), sim.ctypes.data_as(_f64p))
