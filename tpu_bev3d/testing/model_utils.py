"""Synthetic-input factories for model tests.

Mirrors the reference's test harness (ref: mmdet3d/testing/model_utils.py:47-80
create_detector_inputs — random points/GT, real configs) adapted to the
fixed-shape batch contract of the TPU build.
"""
from __future__ import annotations

import numpy as np

from ..registry import MODELS


def lidar_scan_points(rng, num_points, pc_range, ground_z=-1.73,
                      num_obstacles=40):
    """Surface-clustered points from a simulated 64-beam spinning lidar
    (ground-plane returns + random vertical obstacles).

    Uniform-random points are NOT representative of lidar: real returns
    cluster on surfaces, which is what gives sparse voxel grids their
    tile/occupancy structure. Benchmarks of sparsity-exploiting code paths
    must use this (or real frames), not the uniform generator.
    """
    lo = np.asarray(pc_range[:3], np.float64)
    hi = np.asarray(pc_range[3:], np.float64)
    front_only = lo[0] >= -1e-6
    elev = np.deg2rad(np.linspace(-24.9, 2.0, 64))
    az_lim = np.pi / 4 + 0.2 if front_only else np.pi
    azim = rng.uniform(-az_lim, az_lim, 2048)
    E, A = np.meshgrid(elev, azim, indexing='ij')
    h = -ground_z
    with np.errstate(divide='ignore'):
        r = np.where(np.sin(E) < -1e-3, h / -np.sin(E), 120.0)
    for _ in range(num_obstacles):
        az0 = rng.uniform(-az_lim, az_lim)
        width = rng.uniform(0.02, 0.12)
        dist = rng.uniform(4, 0.8 * float(hi[0] - lo[0]))
        hgt = rng.uniform(0.5, 2.5)
        hit = (np.abs(A - az0) < width) \
            & ((np.tan(E) * dist + h) < hgt) & (r > dist)
        r = np.where(hit, dist, r)
    r = r * (1 + rng.normal(0, 0.005, r.shape))
    x = r * np.cos(E) * np.cos(A)
    y = r * np.cos(E) * np.sin(A)
    z = h * 0 + ground_z + h + r * np.sin(E)
    pts = np.stack([x, y, z], -1).reshape(-1, 3)
    inb = ((pts >= lo) & (pts < hi - 1e-4)).all(1)
    pts = pts[inb]
    if len(pts) == 0:                       # degenerate range: fall back
        return rng.uniform(lo, hi, (num_points, 3)).astype(np.float32)
    sel = rng.integers(0, len(pts), num_points)
    return pts[sel].astype(np.float32)


def create_detector_inputs(rng=None, batch_size=1, num_points=512,
                           point_dim=4, num_gt=8, num_classes=3,
                           pc_range=(0, -40, -3, 70.4, 40, 1),
                           with_velocity=False, distribution='uniform'):
    """Fixed-shape synthetic batch: points uniform in pc_range (or
    surface-clustered with distribution='lidar'), GT boxes with plausible
    dims. Returns dict of numpy arrays."""
    rng = rng or np.random.default_rng(0)
    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:])
    if distribution == 'lidar':
        pts = np.stack([lidar_scan_points(rng, num_points, pc_range)
                        for _ in range(batch_size)])
    else:
        pts = rng.uniform(lo, hi,
                          (batch_size, num_points, 3)).astype(np.float32)
    extra = rng.uniform(0, 1, (batch_size, num_points, point_dim - 3)
                        ).astype(np.float32)
    points = np.concatenate([pts, extra], -1)
    points_mask = np.ones((batch_size, num_points), bool)

    ctr = rng.uniform(lo + 2, hi - 2, (batch_size, num_gt, 3))
    dims = rng.uniform(0.8, 4.0, (batch_size, num_gt, 3))
    yaw = rng.uniform(-np.pi, np.pi, (batch_size, num_gt, 1))
    parts = [ctr, dims, yaw]
    box_dim = 7
    if with_velocity:
        parts.append(rng.uniform(-1, 1, (batch_size, num_gt, 2)))
        box_dim = 9
    gt_bboxes = np.concatenate(parts, -1).astype(np.float32)
    gt_labels = rng.integers(0, num_classes,
                             (batch_size, num_gt)).astype(np.int32)
    gt_mask = np.ones((batch_size, num_gt), bool)
    return dict(points=points, points_mask=points_mask,
                gt_bboxes_3d=gt_bboxes, gt_labels_3d=gt_labels,
                gt_mask=gt_mask)


def create_multimodal_inputs(rng=None, batch_size=1, num_points=512,
                             point_dim=5, num_gt=8, num_classes=10,
                             num_cams=6, image_size=(256, 704),
                             pc_range=(-54, -54, -5, 54, 54, 3),
                             with_velocity=True, with_2d_gt=False):
    """LiDAR + multi-camera batch with plausible camera calibration.

    Cameras sit at the origin looking outward at evenly-spaced azimuths,
    camera frame (x right, y down, z forward), lidar frame (x fwd, y left,
    z up) — matches the nuScenes convention the reference consumes
    (projects/BEVFusion/bevfusion/loading.py:14 lidar2img/cam2lidar stacks).
    """
    rng = rng or np.random.default_rng(0)
    batch = create_detector_inputs(
        rng=rng, batch_size=batch_size, num_points=num_points,
        point_dim=point_dim, num_gt=num_gt, num_classes=num_classes,
        pc_range=pc_range, with_velocity=with_velocity)
    H, W = image_size
    batch['imgs'] = rng.uniform(
        -1, 1, (batch_size, num_cams, H, W, 3)).astype(np.float32)

    fx = W * 0.8
    intrins = np.zeros((num_cams, 3, 3), np.float32)
    intrins[:, 0, 0] = fx
    intrins[:, 1, 1] = fx
    intrins[:, 0, 2] = W / 2
    intrins[:, 1, 2] = H / 2
    intrins[:, 2, 2] = 1

    cam2lidar = np.zeros((num_cams, 4, 4), np.float32)
    for i in range(num_cams):
        az = 2 * np.pi * i / num_cams
        fwd = np.array([np.cos(az), np.sin(az), 0.0])   # cam z in lidar
        right = np.array([np.sin(az), -np.cos(az), 0.0])  # cam x in lidar
        down = np.array([0.0, 0.0, -1.0])               # cam y in lidar
        cam2lidar[i, :3, 0] = right
        cam2lidar[i, :3, 1] = down
        cam2lidar[i, :3, 2] = fwd
        cam2lidar[i, 3, 3] = 1

    k44 = np.tile(np.eye(4, dtype=np.float32), (num_cams, 1, 1))
    k44[:, :3, :3] = intrins
    lidar2img = k44 @ np.linalg.inv(cam2lidar)

    def tile(a):
        return np.tile(a[None], (batch_size,) + (1,) * a.ndim)

    batch['intrins'] = tile(intrins)
    batch['cam2lidar'] = tile(cam2lidar)
    batch['lidar2img'] = tile(lidar2img.astype(np.float32))
    batch['post_rots'] = tile(np.tile(np.eye(3, dtype=np.float32),
                                      (num_cams, 1, 1)))
    batch['post_trans'] = tile(np.zeros((num_cams, 3), np.float32))

    if not with_2d_gt:
        return batch
    # per-camera 2D GT: project 3D centers, synthesize boxes from the
    # projected size (the aux-2D supervision the reference loads per
    # camera — StreamPETR loading.py centers2d/gt_bboxes plumbing)
    G = batch['gt_bboxes_3d'].shape[1]
    gtb = batch['gt_bboxes_3d']
    boxes2d = np.zeros((batch_size, num_cams, G, 4), np.float32)
    centers2d = np.zeros((batch_size, num_cams, G, 2), np.float32)
    labels2d = np.zeros((batch_size, num_cams, G), np.int32)
    mask2d = np.zeros((batch_size, num_cams, G), bool)
    for b in range(batch_size):
        hom = np.concatenate([gtb[b, :, :3],
                              np.ones((G, 1), np.float32)], -1)
        for c in range(num_cams):
            p = hom @ lidar2img[c].T                       # [G, 4]
            z = p[:, 2]
            u, v = p[:, 0] / np.maximum(z, 1e-3), p[:, 1] / np.maximum(
                z, 1e-3)
            size_px = fx * np.maximum(gtb[b, :, 3], 0.5) / np.maximum(
                z, 1e-3)
            ok = (z > 0.5) & (u > 0) & (u < W) & (v > 0) & (v < H) \
                & batch['gt_mask'][b].astype(bool)
            boxes2d[b, c] = np.stack(
                [np.clip(u - size_px / 2, 0, W - 1),
                 np.clip(v - size_px / 2, 0, H - 1),
                 np.clip(u + size_px / 2, 1, W),
                 np.clip(v + size_px / 2, 1, H)], -1)
            centers2d[b, c] = np.stack([np.clip(u, 0, W - 1),
                                        np.clip(v, 0, H - 1)], -1)
            labels2d[b, c] = batch['gt_labels_3d'][b]
            mask2d[b, c] = ok
    batch['gt_bboxes_2d'] = boxes2d
    batch['gt_labels_2d'] = np.clip(labels2d, 0, None)
    batch['centers2d'] = centers2d
    batch['gt_mask_2d'] = mask2d
    return batch


def build_detector_from_cfg(cfg):
    """Build a detector nn.Module from a model config dict."""
    import tpu_bev3d.models  # noqa: F401 — trigger registration
    return MODELS.build(dict(cfg))
