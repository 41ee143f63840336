"""Native C++ point-IO library: parity with the numpy path."""
import os

import numpy as np
import pytest

from tpu_bev3d.datasets import pointio


pytestmark = pytest.mark.skipif(not pointio.available(),
                                reason='no C++ toolchain')


def _write_bin(path, n=1000, dim=5, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-60, 60, (n, dim)).astype(np.float32)
    pts.tofile(path)
    return pts


def test_load_bin_matches_numpy(tmp_path):
    p = str(tmp_path / 'a.bin')
    pts = _write_bin(p)
    out, n = pointio.load_bin(p, load_dim=5, use_dim=4, capacity=2000)
    assert n == 1000
    np.testing.assert_array_equal(out[:n], pts[:, :4])
    assert np.all(out[n:] == 0)


def test_load_bin_range_filter(tmp_path):
    p = str(tmp_path / 'b.bin')
    pts = _write_bin(p)
    rng_box = [-20, -20, -20, 20, 20, 20]
    out, n = pointio.load_bin(p, load_dim=5, use_dim=5, capacity=2000,
                              pc_range=rng_box)
    keep = np.all((pts[:, :3] >= -20) & (pts[:, :3] < 20), axis=1)
    np.testing.assert_array_equal(out[:n], pts[keep])
    assert n == keep.sum()


def test_load_batch_and_capacity(tmp_path):
    ps = []
    ref = []
    for i in range(3):
        p = str(tmp_path / f'{i}.bin')
        ref.append(_write_bin(p, n=500 + 100 * i, seed=i))
        ps.append(p)
    out, counts = pointio.load_batch(ps, load_dim=5, use_dim=5,
                                     capacity=550)
    assert list(counts) == [500, 550, 550]     # capacity caps
    np.testing.assert_array_equal(out[0, :500], ref[0])
    np.testing.assert_array_equal(out[2], ref[2][:550])


def test_transform_native_path(tmp_path):
    from tpu_bev3d.datasets.transforms.loading import LoadPointsFromFile
    p = str(tmp_path / 'c.bin')
    pts = _write_bin(p, dim=4)
    t = LoadPointsFromFile(load_dim=4, use_dim=4, native=True)
    assert t.native
    out = t(dict(lidar_path=p))
    np.testing.assert_array_equal(out['points'], pts)
    # numpy fallback agrees
    t2 = LoadPointsFromFile(load_dim=4, use_dim=4, native=False)
    np.testing.assert_array_equal(t2(dict(lidar_path=p))['points'], pts)
