"""ctypes binding for the native point-IO library (csrc/pointio.cc).

The native path mmap-reads the .bin, range-filters, and fills the
fixed-capacity padded buffer in one pass — the loader analogue of the
reference's torch C++ dataloader workers. Auto-builds with g++ on first
use; falls back cleanly to the numpy path when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'csrc')
_LIB_PATH = os.path.join(_CSRC, 'libpointio.so')
_lib = None
_tried = False


def _load_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # Always invoke make: its mtime check makes this a no-op when the .so
    # is current, and it rebuilds after .cc edits (stale committed binaries
    # would otherwise be loaded silently).
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
    lib.pointio_load_bin.restype = ctypes.c_int64
    lib.pointio_load_bin.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.pointio_load_batch.restype = ctypes.c_int32
    lib.pointio_load_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load_lib() is not None


def _range_ptrs(pc_range):
    if pc_range is None:
        z = (ctypes.c_float * 3)(0, 0, 0)
        return z, z, 0
    lo = (ctypes.c_float * 3)(*[float(v) for v in pc_range[:3]])
    hi = (ctypes.c_float * 3)(*[float(v) for v in pc_range[3:6]])
    return lo, hi, 1


def load_bin(path: str, load_dim: int, use_dim: int, capacity: int,
             pc_range: Optional[Sequence[float]] = None
             ) -> Tuple[np.ndarray, int]:
    """→ (points [capacity, use_dim] f32 zero-padded, n_valid)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError('native pointio unavailable')
    out = np.empty((capacity, use_dim), np.float32)
    lo, hi, has = _range_ptrs(pc_range)
    n = lib.pointio_load_bin(
        path.encode(), load_dim, use_dim, lo, hi, has,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), capacity)
    if n < 0:
        raise IOError(f'pointio failed to read {path}')
    return out, int(n)


def load_batch(paths: Sequence[str], load_dim: int, use_dim: int,
               capacity: int,
               pc_range: Optional[Sequence[float]] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """→ (points [B, capacity, use_dim], counts [B])."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError('native pointio unavailable')
    B = len(paths)
    out = np.empty((B, capacity, use_dim), np.float32)
    counts = np.empty((B,), np.int64)
    lo, hi, has = _range_ptrs(pc_range)
    rc = lib.pointio_load_batch(
        '\n'.join(paths).encode(), B, load_dim, use_dim, lo, hi, has,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), capacity,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        bad = [p for p, c in zip(paths, counts) if c < 0]
        raise IOError(f'pointio failed for {bad[:3]}')
    return out, counts
