"""Synthetic-input factories for model tests.

Mirrors the reference's test harness (ref: mmdet3d/testing/model_utils.py:47-80
create_detector_inputs — random points/GT, real configs) adapted to the
fixed-shape batch contract of the TPU build.
"""
from __future__ import annotations

import numpy as np

from ..registry import MODELS


def create_detector_inputs(rng=None, batch_size=1, num_points=512,
                           point_dim=4, num_gt=8, num_classes=3,
                           pc_range=(0, -40, -3, 70.4, 40, 1),
                           with_velocity=False):
    """Fixed-shape synthetic batch: points uniform in pc_range, GT boxes with
    plausible dims. Returns dict of numpy arrays."""
    rng = rng or np.random.default_rng(0)
    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:])
    pts = rng.uniform(lo, hi, (batch_size, num_points, 3)).astype(np.float32)
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


def build_detector_from_cfg(cfg):
    """Build a detector nn.Module from a model config dict."""
    import tpu_bev3d.models  # noqa: F401 — trigger registration
    return MODELS.build(dict(cfg))
