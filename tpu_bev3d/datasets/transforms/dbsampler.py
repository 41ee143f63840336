"""GT-database sampler for ObjectSample paste augmentation.

Ref: mmdet3d/datasets/transforms/dbsampler.py — BatchSampler:26 (shuffled
epoch-cycling per-class sampler), DataBaseSampler:99 (sample_all:202,
collision-checked sample_class_v2:307, difficulty/num-points filters
:162-201). Collision test = rotated BEV IoU > 0 between candidate and
existing boxes (numpy polygon test replaced by corner-interval SAT via the
iou path used at eval; a cheap AABB prefilter keeps it fast).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from ...structures import boxes3d as B


def _bev_collision(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """[Na,7],[Nb,7] → [Na,Nb] bool rotated-BEV overlap (exact via corner
    separating-axis test on the 4-corner polygons)."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), bool)
    ca = B.corners_bev(boxes_a)         # [Na,4,2]
    cb = B.corners_bev(boxes_b)         # [Nb,4,2]

    def axes(c):
        e = np.roll(c, -1, axis=1) - c  # [N,4,2]
        n = np.stack([-e[..., 1], e[..., 0]], -1)
        return n                        # [N,4,2]

    def project(c, ax):
        # c [N,4,2] onto ax [M,4,2] → min/max [N,M,4]
        d = np.einsum('nke,mae->nmak', c, ax)
        return d.min(-1), d.max(-1)

    axa, axb = axes(ca), axes(cb)
    overlap = np.ones((len(boxes_a), len(boxes_b)), bool)
    # SAT on A's axes
    pa_min = np.einsum('nke,nae->nak', ca, axa).min(-1)
    pa_max = np.einsum('nke,nae->nak', ca, axa).max(-1)
    pb_min, pb_max = project(cb, axa)   # [Nb,Na,4]
    sep_a = (pb_max.transpose(1, 0, 2) < pa_min[:, None]) \
        | (pb_min.transpose(1, 0, 2) > pa_max[:, None])
    overlap &= ~sep_a.any(-1)
    # SAT on B's axes
    qb_min = np.einsum('nke,nae->nak', cb, axb).min(-1)
    qb_max = np.einsum('nke,nae->nak', cb, axb).max(-1)
    qa_min, qa_max = project(ca, axb)   # [Na,Nb,4]
    sep_b = (qa_max < qb_min[None]) | (qa_min > qb_max[None])
    overlap &= ~sep_b.any(-1)
    return overlap


class BatchSampler:
    """Shuffled cycling sampler over one class's db infos (ref :26-96)."""

    def __init__(self, sampled_list: List[dict], shuffle: bool = True,
                 seed: int = 0):
        self._list = sampled_list
        self._idx = 0
        self._shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._order = np.arange(len(sampled_list))
        if shuffle:
            self._rng.shuffle(self._order)

    def sample(self, num: int) -> List[dict]:
        if not self._list:
            return []
        out = []
        for _ in range(num):
            if self._idx >= len(self._order):
                self._idx = 0
                if self._shuffle:
                    self._rng.shuffle(self._order)
            out.append(self._list[self._order[self._idx]])
            self._idx += 1
        return out


class DataBaseSampler:
    """Ref DataBaseSampler:99-345."""

    def __init__(self, info_path: str = '', data_root: str = '',
                 rate: float = 1.0, prepare: Optional[dict] = None,
                 sample_groups: Optional[dict] = None,
                 classes: Optional[Sequence[str]] = None,
                 points_loader: Optional[dict] = None, seed: int = 0, **kw):
        self.data_root = data_root
        self.rate = rate
        self.classes = list(classes or [])
        if isinstance(sample_groups, dict):
            self.sample_groups = {k: int(v) for k, v in
                                  sample_groups.items()}
        else:
            self.sample_groups = {}
            for g in sample_groups or []:
                self.sample_groups.update({k: int(v) for k, v in g.items()})
        # lazy-load the dbinfos at first use: transforms must CONSTRUCT
        # without data on disk (config validation builds every pipeline
        # transform; the reference's mmengine registry has the same
        # property because its FileClient reads lazily too)
        self._info_path = os.path.join(data_root, info_path) \
            if data_root and not os.path.isabs(info_path) else info_path
        self._prepare = prepare or {}
        self._seed = seed
        self._loaded = False
        self._db_infos = {}
        self.samplers = {}

    @property
    def db_infos(self):
        self._ensure_loaded()
        return self._db_infos

    def _ensure_loaded(self):
        if self._loaded:
            return
        with open(self._info_path, 'rb') as f:
            db_infos = pickle.load(f)
        prepare = self._prepare
        if 'filter_by_difficulty' in prepare:
            removed = set(prepare['filter_by_difficulty'])
            db_infos = {k: [i for i in v
                            if i.get('difficulty', 0) not in removed]
                        for k, v in db_infos.items()}
        if 'filter_by_min_points' in prepare:
            for cls, mn in prepare['filter_by_min_points'].items():
                if cls in db_infos:
                    db_infos[cls] = [i for i in db_infos[cls]
                                    if i.get('num_points_in_gt', 1e9) >= mn]
        self._db_infos = db_infos
        self.samplers = {k: BatchSampler(v, seed=self._seed)
                         for k, v in db_infos.items()}
        self._loaded = True

    def sample_all(self, gt_bboxes: np.ndarray, gt_labels: np.ndarray,
                   class_names: Sequence[str]) -> Optional[dict]:
        self._ensure_loaded()
        sampled_boxes, sampled_labels, sampled_pts = [], [], []
        avoid = gt_bboxes[:, :7].copy() if len(gt_bboxes) else \
            np.zeros((0, 7), np.float32)
        for cls, max_num in self.sample_groups.items():
            if cls not in self.samplers or cls not in class_names:
                continue
            label = class_names.index(cls)
            n_exist = int((gt_labels == label).sum()) if len(gt_labels) \
                else 0
            n = int(self.rate * max(0, max_num - n_exist))
            if n <= 0:
                continue
            cands = self.samplers[cls].sample(n)
            for c in cands:
                box = np.asarray(c['box3d_lidar'], np.float32)[None]
                if _bev_collision(box[:, :7], avoid).any() or (
                        sampled_boxes and _bev_collision(
                            box[:, :7],
                            np.concatenate(sampled_boxes)[:, :7]).any()):
                    continue
                sampled_boxes.append(box)
                sampled_labels.append(label)
                p = c.get('path', '')
                if p:
                    full = os.path.join(self.data_root, p) \
                        if self.data_root and not os.path.isabs(p) else p
                    pts = np.fromfile(full, np.float32).reshape(
                        -1, c.get('num_features', 4)) \
                        if os.path.exists(full) else \
                        np.zeros((0, 4), np.float32)
                else:
                    pts = np.zeros((0, 4), np.float32)
                # db points are box-relative: shift to box center (ref :334)
                if len(pts):
                    pts = pts.copy()
                    pts[:, :3] += box[0, :3]
                sampled_pts.append(pts)
        if not sampled_boxes:
            return None
        boxes = np.concatenate(sampled_boxes, 0)
        if len(gt_bboxes) and gt_bboxes.shape[1] > boxes.shape[1]:
            boxes = np.concatenate(
                [boxes, np.zeros((len(boxes),
                                  gt_bboxes.shape[1] - boxes.shape[1]),
                                 np.float32)], -1)
        return dict(
            gt_bboxes_3d=boxes,
            gt_labels_3d=np.asarray(sampled_labels, np.int64),
            points=np.concatenate(sampled_pts, 0) if sampled_pts
            else np.zeros((0, 4), np.float32))
