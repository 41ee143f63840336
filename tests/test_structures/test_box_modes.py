"""Box coordinate-mode conversions: cam↔lidar roundtrip + KITTI-style
axis conventions (pattern: ref tests/test_structures/test_bbox/
test_box3d.py)."""
import numpy as np

from tpu_bev3d.structures.boxes3d import (cam_to_lidar, corners_bev,
                                          corners_lidar, lidar_to_cam,
                                          limit_yaw, points_in_rbbox)


def _standard_cam2lidar():
    # cam (x right, y down, z fwd) → lidar (x fwd, y left, z up):
    # x_l = z_c, y_l = -x_c, z_l = -y_c
    m = np.zeros((4, 4), np.float32)
    m[0, 2] = 1
    m[1, 0] = -1
    m[2, 1] = -1
    m[3, 3] = 1
    return m


def test_cam_lidar_roundtrip():
    rng = np.random.default_rng(0)
    cam = np.concatenate([
        rng.uniform(-10, 10, (8, 2)), rng.uniform(5, 40, (8, 1)),
        rng.uniform(1, 4, (8, 3)), rng.uniform(-np.pi, np.pi, (8, 1))],
        -1).astype(np.float32)
    c2l = _standard_cam2lidar()
    lid = cam_to_lidar(cam, c2l)
    back = lidar_to_cam(lid, np.linalg.inv(c2l))
    assert np.allclose(back[:, :6], cam[:, :6], atol=1e-4)
    d = limit_yaw(back[:, 6] - cam[:, 6], 0.5, 2 * np.pi)
    assert np.allclose(d, 0, atol=1e-4)


def test_cam_to_lidar_geometry():
    # a box 10m ahead of the camera → 10m along lidar +x
    cam = np.array([[0, 1, 10, 4, 1.5, 1.8, 0.0]], np.float32)
    lid = cam_to_lidar(cam, _standard_cam2lidar())
    assert np.allclose(lid[0, :3], [10, 0, -1], atol=1e-5)
    # dims (l, h, w) → (dx=l, dy=w, dz=h)
    assert np.allclose(lid[0, 3:6], [4, 1.8, 1.5], atol=1e-5)


def test_corners_consistency():
    b = np.array([[1, 2, 0, 4, 2, 1.5, 0.3]], np.float32)
    c3 = corners_lidar(b)
    cb = corners_bev(b)
    assert c3.shape == (1, 8, 3)
    # BEV footprint of the 3D corners matches corners_bev as a set
    xy = np.unique(np.round(c3[0, :, :2], 4), axis=0)
    xy2 = np.unique(np.round(cb[0], 4), axis=0)
    assert np.allclose(np.sort(xy, 0), np.sort(xy2, 0), atol=1e-3)
    inside = points_in_rbbox(np.array([[1.0, 2.0, 0.5]]), b)
    assert inside[0, 0]
