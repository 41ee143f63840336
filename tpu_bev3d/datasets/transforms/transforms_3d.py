"""3D augmentation / filter transforms (host-side numpy).

Refs: mmdet3d/datasets/transforms/transforms_3d.py — ObjectSample:328,
GlobalRotScaleTrans:631, RandomFlip3D:75, PointsRangeFilter:905,
ObjectRangeFilter:845, ObjectNameFilter:1003, PointShuffle:812,
PointSample:1005. Aug matrices are accumulated like the BEVFusion project's
transforms (projects/BEVFusion/bevfusion/transforms_3d.py:131-204 records
``lidar_aug_matrix``) so the view transform can undo them.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ...registry import TRANSFORMS
from ...structures import boxes3d as B


def _rng(results):
    if '_rng' not in results:
        results['_rng'] = np.random.default_rng()
    return results['_rng']


def _update_lidar_aug(results, rot=None, trans=None, scale=None, flip=None):
    m = results.get('lidar_aug_matrix', np.eye(4, dtype=np.float32))
    new = np.eye(4, dtype=np.float32)
    if rot is not None:
        new[:3, :3] = rot
    if scale is not None:
        new[:3, :3] = new[:3, :3] * scale
    if flip is not None:
        new[:3, :3] = flip @ new[:3, :3]
    if trans is not None:
        new[:3, 3] = trans
    results['lidar_aug_matrix'] = (new @ m).astype(np.float32)


@TRANSFORMS.register_module()
class GlobalRotScaleTrans:
    """Ref transforms_3d.py:631-765."""

    def __init__(self, rot_range=(-0.78539816, 0.78539816),
                 scale_ratio_range=(0.95, 1.05),
                 translation_std=(0, 0, 0), **kw):
        self.rot_range = rot_range
        self.scale_ratio_range = scale_ratio_range
        self.translation_std = translation_std

    def __call__(self, results: dict) -> dict:
        rng = _rng(results)
        angle = rng.uniform(*self.rot_range)
        scale = rng.uniform(*self.scale_ratio_range)
        trans = rng.normal(0, self.translation_std, 3).astype(np.float32)

        pts = results['points']
        boxes = results.get('gt_bboxes_3d')
        rot = B.rot_mat_z(np.float32(angle), np)
        pts = pts.copy()
        pts[:, :3] = pts[:, :3] @ rot.T
        pts[:, :3] *= scale
        pts[:, :3] += trans
        results['points'] = pts
        if boxes is not None and len(boxes):
            boxes = B.rotate(boxes, np.float32(angle), None, np)
            boxes = B.scale(boxes, scale, np)
            boxes = B.translate(boxes, trans, np)
            results['gt_bboxes_3d'] = boxes
        results['pcd_rotation'] = rot
        results['pcd_scale_factor'] = scale
        results['pcd_trans'] = trans
        _update_lidar_aug(results, rot=rot, scale=scale, trans=trans)
        return results


@TRANSFORMS.register_module()
class RandomFlip3D:
    """BEV flip (ref transforms_3d.py:75-180 + BEVFusionRandomFlip3D)."""

    def __init__(self, flip_ratio_bev_horizontal=0.5,
                 flip_ratio_bev_vertical=0.0, sync_2d: bool = True, **kw):
        self.ratio_h = flip_ratio_bev_horizontal
        self.ratio_v = flip_ratio_bev_vertical

    def __call__(self, results: dict) -> dict:
        rng = _rng(results)
        flip_mat = np.eye(3, dtype=np.float32)
        for direction, ratio, axis in (
                ('horizontal', self.ratio_h, 1),
                ('vertical', self.ratio_v, 0)):
            if rng.uniform() < ratio:
                pts = results['points'].copy()
                pts[:, axis] = -pts[:, axis]
                results['points'] = pts
                if results.get('gt_bboxes_3d') is not None \
                        and len(results['gt_bboxes_3d']):
                    results['gt_bboxes_3d'] = B.flip(
                        results['gt_bboxes_3d'], direction, np)
                flip_mat[axis, axis] *= -1
                results[f'pcd_{direction}_flip'] = True
        _update_lidar_aug(results, flip=flip_mat)
        return results


@TRANSFORMS.register_module()
class PointsRangeFilter:
    """Ref transforms_3d.py:905-940."""

    def __init__(self, point_cloud_range: Sequence[float], **kw):
        self.pcr = np.asarray(point_cloud_range, np.float32)

    def __call__(self, results: dict) -> dict:
        pts = results['points']
        m = ((pts[:, 0] > self.pcr[0]) & (pts[:, 0] < self.pcr[3])
             & (pts[:, 1] > self.pcr[1]) & (pts[:, 1] < self.pcr[4])
             & (pts[:, 2] > self.pcr[2]) & (pts[:, 2] < self.pcr[5]))
        results['points'] = pts[m]
        if 'pts_semantic_mask' in results:
            results['pts_semantic_mask'] = results['pts_semantic_mask'][m]
        return results


@TRANSFORMS.register_module()
class ObjectRangeFilter:
    """Ref transforms_3d.py:845-903 (BEV-range filter + yaw limit)."""

    def __init__(self, point_cloud_range: Sequence[float], **kw):
        p = point_cloud_range
        self.bev_range = np.asarray([p[0], p[1], p[3], p[4]], np.float32)

    def __call__(self, results: dict) -> dict:
        boxes = results.get('gt_bboxes_3d')
        if boxes is None or not len(boxes):
            return results
        m = B.in_range_bev(boxes, self.bev_range, np)
        boxes = boxes[m]
        boxes[:, 6] = B.limit_yaw(boxes[:, 6], offset=0.5, period=2 * np.pi,
                                  xp=np)
        results['gt_bboxes_3d'] = boxes
        results['gt_labels_3d'] = results['gt_labels_3d'][m]
        return results


@TRANSFORMS.register_module()
class ObjectNameFilter:
    """Keep only configured classes (ref transforms_3d.py:1003-1030)."""

    def __init__(self, classes: Sequence[str], **kw):
        self.classes = list(classes)

    def __call__(self, results: dict) -> dict:
        labels = results.get('gt_labels_3d')
        if labels is None:
            return results
        names = results.get('metainfo', {}).get('classes', self.classes)
        keep_ids = [i for i, n in enumerate(names) if n in self.classes]
        m = np.isin(labels, keep_ids)
        results['gt_bboxes_3d'] = results['gt_bboxes_3d'][m]
        results['gt_labels_3d'] = labels[m]
        return results


@TRANSFORMS.register_module()
class PointShuffle:
    """Ref transforms_3d.py:812-830."""

    def __call__(self, results: dict) -> dict:
        pts = results['points']
        perm = _rng(results).permutation(len(pts))
        results['points'] = pts[perm]
        if 'pts_semantic_mask' in results:
            results['pts_semantic_mask'] = results['pts_semantic_mask'][perm]
        return results


@TRANSFORMS.register_module()
class PointSample:
    """Random subsample to num_points (ref transforms_3d.py:1005-1100)."""

    def __init__(self, num_points: int, **kw):
        self.num_points = num_points

    def __call__(self, results: dict) -> dict:
        pts = results['points']
        n = len(pts)
        rng = _rng(results)
        if n >= self.num_points:
            idx = rng.choice(n, self.num_points, replace=False)
        else:
            idx = rng.choice(n, self.num_points, replace=True)
        results['points'] = pts[idx]
        if 'pts_semantic_mask' in results:
            results['pts_semantic_mask'] = results['pts_semantic_mask'][idx]
        return results


@TRANSFORMS.register_module()
class ObjectSample:
    """GT-database paste augmentation (ref transforms_3d.py:328-466 +
    dbsampler). Samples boxes+points from the database, collision-checks
    against existing GT in BEV, removes covered background points."""

    def __init__(self, db_sampler: dict, sample_2d: bool = False,
                 use_ground_plane: bool = False, **kw):
        from ...registry import TRANSFORMS as _T
        from .dbsampler import DataBaseSampler
        if isinstance(db_sampler, dict):
            cfg = dict(db_sampler)
            cfg.pop('type', None)
            self.db_sampler = DataBaseSampler(**cfg)
        else:
            self.db_sampler = db_sampler
        self.disabled = False

    def __call__(self, results: dict) -> dict:
        if self.disabled:
            return results
        gt_bboxes = results['gt_bboxes_3d']
        gt_labels = results['gt_labels_3d']
        names = results.get('metainfo', {}).get('classes', [])
        sampled = self.db_sampler.sample_all(gt_bboxes, gt_labels, names)
        if sampled is None:
            return results
        results['gt_bboxes_3d'] = np.concatenate(
            [gt_bboxes, sampled['gt_bboxes_3d']], 0) if len(gt_bboxes) \
            else sampled['gt_bboxes_3d']
        results['gt_labels_3d'] = np.concatenate(
            [gt_labels, sampled['gt_labels_3d']], 0).astype(np.int64) \
            if len(gt_labels) else sampled['gt_labels_3d']
        # remove original points inside sampled boxes, then add their points
        pts = results['points']
        inside = B.points_in_rbbox(pts[:, :3], sampled['gt_bboxes_3d'][:, :7])
        pts = pts[~inside.any(axis=1)]
        sp = sampled['points']
        if sp.shape[1] < pts.shape[1]:
            sp = np.concatenate(
                [sp, np.zeros((len(sp), pts.shape[1] - sp.shape[1]),
                              np.float32)], -1)
        results['points'] = np.concatenate([sp[:, :pts.shape[1]], pts], 0)
        return results


@TRANSFORMS.register_module()
class ObjectNoise:
    """Per-object pose jitter with collision rejection (ref
    transforms_3d.py:468 ObjectNoise + the numba noise_per_box kernels in
    data_augment_utils.py:4-200 — here plain numpy over the same
    separating-axis collision test as the DB sampler).

    For every GT box, `num_try` candidate (translation, yaw) noises are
    drawn; the first candidate whose noised box does not collide with any
    OTHER current box is applied to the box and to the points inside it
    (rotation about the box center, like the reference's point_transform).
    """

    def __init__(self, translation_std=(0.25, 0.25, 0.25),
                 rot_range=(-0.15707963267, 0.15707963267),
                 num_try: int = 100, seed: Optional[int] = None):
        self.t_std = np.asarray(translation_std, np.float32)
        self.rot_range = tuple(rot_range)
        self.num_try = num_try
        self.rng = np.random.default_rng(seed)

    def __call__(self, results: dict) -> dict:
        boxes = np.asarray(results.get('gt_bboxes_3d', np.zeros((0, 7))),
                           np.float32)
        if len(boxes) == 0:
            return results
        pts = results['points']
        inside = B.points_in_rbbox(pts[:, :3], boxes[:, :7])   # [P, N]
        new_boxes = boxes.copy()
        for i in range(len(boxes)):
            ts = self.rng.normal(0, self.t_std,
                                 (self.num_try, 3)).astype(np.float32)
            rs = self.rng.uniform(self.rot_range[0], self.rot_range[1],
                                  self.num_try).astype(np.float32)
            others = np.delete(new_boxes, i, axis=0)
            for t, r in zip(ts, rs):
                cand = new_boxes[i].copy()
                cand[:3] += t
                cand[6] += r
                from .dbsampler import _bev_collision
                if not _bev_collision(cand[None, :7],
                                      others[:, :7]).any():
                    # move the box's points with it: rotate about the
                    # ORIGINAL center, then translate
                    sel = inside[:, i]
                    ctr = new_boxes[i, :3].copy()
                    ctr[2] += new_boxes[i, 5] / 2
                    c, s = np.cos(r), np.sin(r)
                    R = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                                   np.float32)
                    rel = pts[sel, :3] - ctr
                    pts[sel, :3] = rel @ R.T + ctr + t
                    new_boxes[i] = cand
                    break
        results['gt_bboxes_3d'] = new_boxes
        results['points'] = pts
        return results
