"""Multi-sweep loading: sweep points transformed into the keyframe frame
with a time-lag channel (ref LoadPointsFromMultiSweeps, loading.py:316)."""
import os

import numpy as np

from tpu_bev3d.datasets.transforms import LoadPointsFromMultiSweeps


def test_multisweep_concat_and_transform(tmp_path):
    rng = np.random.default_rng(0)
    key_pts = rng.uniform(-10, 10, (100, 5)).astype(np.float32)
    sweep_pts = rng.uniform(-10, 10, (50, 5)).astype(np.float32)
    p = tmp_path / 'sweep.bin'
    sweep_pts.tofile(p)

    # sweep frame rotated 90° around z + translated
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    t = np.array([1.0, 2.0, 0.0], np.float32)
    results = dict(
        points=key_pts[:, :4],
        timestamp=1_500_000,
        lidar_sweeps=[dict(
            lidar_points=dict(lidar_path=str(p)),
            timestamp=1_000_000,
            sensor2lidar_rotation=R.tolist(),
            sensor2lidar_translation=t.tolist())])
    out = LoadPointsFromMultiSweeps(sweeps_num=2, load_dim=5,
                                    use_dim=[0, 1, 2, 3])(results)
    pts = out['points']
    assert pts.shape[0] == 150
    # keyframe dt = 0
    assert np.allclose(pts[:100, -1], 0)
    # sweep dt = 0.5 s
    assert np.allclose(pts[100:, -1], 0.5, atol=1e-6)
    # sweep xyz transformed
    expect = sweep_pts[:, :3] @ R.T + t
    assert np.allclose(pts[100:, :3], expect, atol=1e-5)
