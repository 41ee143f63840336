"""Loading transforms (host-side numpy).

Refs: mmdet3d/datasets/transforms/loading.py — LoadPointsFromFile:554
(bin/pcd load, dim select), LoadPointsFromMultiSweeps:316 (sweep concat,
time-lag channel, remove_close), LoadAnnotations3D:749.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ...registry import TRANSFORMS


def _load_points_file(path: str, load_dim: int) -> np.ndarray:
    if path.endswith('.npy'):
        pts = np.load(path)
    else:
        pts = np.fromfile(path, dtype=np.float32)
    return pts.reshape(-1, load_dim).astype(np.float32)


@TRANSFORMS.register_module()
class LoadPointsFromFile:
    """Ref loading.py:554-650.

    native=True routes through the C++ point-IO library
    (csrc/pointio.cc via datasets/pointio.py): mmap read + optional
    range filter in one pass — the loader analogue of the reference's
    torch C++ dataloader workers. Requires use_dim to be a prefix range;
    falls back to numpy when the library can't build.
    """

    def __init__(self, coord_type: str = 'LIDAR', load_dim: int = 4,
                 use_dim=4, shift_height: bool = False,
                 native: bool = False, pc_range=None,
                 max_points: int = 400000,
                 backend_args=None, **kw):
        self.load_dim = load_dim
        self.use_dim = list(range(use_dim)) if isinstance(use_dim, int) \
            else list(use_dim)
        prefix = self.use_dim == list(range(len(self.use_dim)))
        self.pc_range = list(pc_range) if pc_range is not None else None
        self.max_points = max_points
        self.shift_height = shift_height
        self.native = bool(native) and prefix and not shift_height
        if self.native:
            from ..pointio import available
            self.native = available()

    def _shift_height(self, pts):
        # ref loading.py:659-665: height channel = z - 99th-percentile
        # floor, inserted after xyz
        floor = np.percentile(pts[:, 2], 0.99)
        h = (pts[:, 2] - floor)[:, None]
        return np.concatenate([pts[:, :3], h, pts[:, 3:]], 1)

    def __call__(self, results: dict) -> dict:
        path = results.get('lidar_path') or \
            results.get('lidar_points', {}).get('lidar_path')
        if self.native and isinstance(path, str) \
                and path.endswith('.bin'):
            from ..pointio import load_bin
            pts, n = load_bin(path, self.load_dim, len(self.use_dim),
                              self.max_points, self.pc_range)
            results['points'] = pts[:n]
            return results
        pts = _load_points_file(path, self.load_dim)[:, self.use_dim]
        if self.shift_height:
            pts = self._shift_height(pts)
        results['points'] = pts
        return results


@TRANSFORMS.register_module()
class LoadPointsFromDict:
    """Inference API path: points already present as ndarray
    (ref loading.py LoadPointsFromDict, used by apis/inference.py:143-146).
    """

    def __init__(self, coord_type: str = 'LIDAR', load_dim: int = 4,
                 use_dim=4, **kw):
        self.use_dim = list(range(use_dim)) if isinstance(use_dim, int) \
            else list(use_dim)

    def __call__(self, results: dict) -> dict:
        results['points'] = np.asarray(
            results['points'], np.float32)[:, self.use_dim]
        return results


@TRANSFORMS.register_module()
class LoadPointsFromMultiSweeps:
    """Concat up to sweeps_num previous sweeps with a time-lag channel
    (ref loading.py:316-460): current sweep gets dt=0, each sweep's points
    are transformed into the keyframe lidar frame, close points removed.
    """

    def __init__(self, sweeps_num: int = 10, load_dim: int = 5,
                 use_dim=(0, 1, 2, 4), pad_empty_sweeps: bool = False,
                 remove_close: bool = False, test_mode: bool = False, **kw):
        self.sweeps_num = sweeps_num
        self.load_dim = load_dim
        self.use_dim = list(use_dim)
        self.pad_empty_sweeps = pad_empty_sweeps
        self.remove_close = remove_close
        self.test_mode = test_mode

    def _remove_close(self, pts, radius=1.0):
        d = np.linalg.norm(pts[:, :2], axis=1)
        return pts[d > radius]

    def __call__(self, results: dict) -> dict:
        pts = results['points']
        # append dt channel = 0 for the keyframe
        pts = np.concatenate(
            [pts, np.zeros((len(pts), 1), np.float32)], -1)
        sweeps = results.get('lidar_sweeps',
                             results.get('sweeps', [])) or []
        out = [pts]
        if self.remove_close:
            out = [np.concatenate([
                self._remove_close(pts[:, :-1]),
                np.zeros((len(self._remove_close(pts[:, :-1])), 1),
                         np.float32)], -1)]
        ts = results.get('timestamp', 0)
        if not sweeps and self.pad_empty_sweeps:
            out *= (self.sweeps_num + 1)
        else:
            n = min(len(sweeps), self.sweeps_num)
            idxs = range(n) if self.test_mode or len(sweeps) <= \
                self.sweeps_num else np.random.choice(
                    len(sweeps), self.sweeps_num, replace=False)
            for i in idxs:
                sw = sweeps[i]
                lp = sw.get('lidar_points', sw)
                p = _load_points_file(lp.get('lidar_path',
                                             lp.get('data_path', '')),
                                      self.load_dim)
                if self.remove_close:
                    p = self._remove_close(p)
                # transform into keyframe frame
                if 'sensor2lidar_rotation' in sw:
                    # our converter's schema (tools/nuscenes_converter.py)
                    R = np.asarray(sw['sensor2lidar_rotation'], np.float32)
                    t = np.asarray(sw['sensor2lidar_translation'],
                                   np.float32)
                    p[:, :3] = p[:, :3] @ R.T + t
                elif 'lidar2sensor' in lp or 'lidar2cam' in lp:
                    # reference v2 sweep schema — exact ref math
                    # (loading.py:442-445: p @ R then -= t; old fixtures
                    # name the matrix lidar2cam)
                    m = np.asarray(
                        lp.get('lidar2sensor', lp.get('lidar2cam')),
                        np.float32)
                    p[:, :3] = p[:, :3] @ m[:3, :3]
                    p[:, :3] = p[:, :3] - m[:3, 3]
                else:
                    mat = np.asarray(sw.get('sensor2lidar', np.eye(4)),
                                     np.float32)
                    p[:, :3] = p[:, :3] @ mat[:3, :3].T + mat[:3, 3]
                dt = float(ts - sw.get('timestamp', ts))
                # Unit is keyed off the pkl schema, not magnitude-sniffed:
                # our converter's schema (sensor2lidar_rotation key) stores
                # raw devkit µs; ref v2 pkls store seconds (ref
                # loading.py:440-441 "divided 1e6 in pkl infos").
                if 'sensor2lidar_rotation' in sw:
                    dt = dt * 1e-6
                dtc = np.full((len(p), 1), dt, np.float32)
                out.append(np.concatenate(
                    [p[:, :pts.shape[1] - 1], dtc], -1))
        allpts = np.concatenate(out, 0)
        results['points'] = allpts[:, self.use_dim + [allpts.shape[1] - 1]] \
            if max(self.use_dim) < allpts.shape[1] - 1 else allpts
        return results


@TRANSFORMS.register_module()
class LoadAnnotations3D:
    """Move parsed ann_info into the working keys; optionally load the
    per-point semantic mask (ref loading.py:749-900 with_seg_3d path —
    SemanticKITTI .label files carry the class in the low 16 bits)."""

    def __init__(self, with_bbox_3d: bool = True, with_label_3d: bool = True,
                 with_seg_3d: bool = False, seg_3d_dtype: str = 'np.int32',
                 **kw):
        self.with_bbox_3d = with_bbox_3d
        self.with_label_3d = with_label_3d
        self.with_seg_3d = with_seg_3d

    def __call__(self, results: dict) -> Optional[dict]:
        ann = results.get('ann_info') or {}
        if self.with_bbox_3d:
            results['gt_bboxes_3d'] = ann.get(
                'gt_bboxes_3d', np.zeros((0, 7), np.float32))
        if self.with_label_3d:
            results['gt_labels_3d'] = ann.get(
                'gt_labels_3d', np.zeros((0,), np.int64))
        if self.with_seg_3d:
            p = results.get('pts_semantic_mask_path')
            if p and os.path.exists(p):
                if p.endswith('.label'):
                    lab = np.fromfile(p, np.uint32) & 0xFFFF
                else:
                    lab = np.fromfile(p, np.int32)
                results['pts_semantic_mask'] = lab.astype(np.int32)
            elif 'pts_semantic_mask' not in results:
                results['pts_semantic_mask'] = np.zeros(
                    (len(results.get('points', [])),), np.int32)
        return results


@TRANSFORMS.register_module()
class LoadImageFromFileMono3D:
    """Load the default camera's image + calibration for mono-3D
    pipelines (ref mmdet3d loading.py LoadImageFromFileMono3D): sets
    'img' (float32 HWC), 'cam2img', and pulls the camera-frame mono
    annotations — either from ``cam_instances[default_cam_key]`` (v2
    infos) or from ``instances`` rows carrying 2D keys (demo-style
    pkls): gt_bboxes, gt_bboxes_labels, centers_2d, depths, and
    CAMERA-frame gt_bboxes_3d / gt_labels_3d."""

    def __init__(self, default_cam_key: str = 'CAM2', **kw):
        self.default_cam_key = default_cam_key

    def __call__(self, results: dict) -> dict:
        from .image_transforms import _imread
        cam = results['images'][self.default_cam_key]
        results['img'] = _imread(cam['img_path']).astype(np.float32)
        results['cam2img'] = np.asarray(cam['cam2img'], np.float32)
        inst = (results.get('cam_instances') or {}).get(
            self.default_cam_key)
        if inst is None:
            inst = [i for i in results.get('instances', [])
                    if 'bbox' in i and i.get('bbox_label_3d', -1) > -1]
        if inst:
            results['gt_bboxes'] = np.asarray(
                [i['bbox'] for i in inst], np.float32)
            results['gt_bboxes_labels'] = np.asarray(
                [i.get('bbox_label', i.get('bbox_label_3d', 0))
                 for i in inst], np.int64)
            results['gt_bboxes_3d'] = np.asarray(
                [i['bbox_3d'] for i in inst], np.float32)
            results['gt_labels_3d'] = np.asarray(
                [i.get('bbox_label_3d', 0) for i in inst], np.int64)
            if 'center_2d' in inst[0] or 'center2d' in inst[0]:
                results['centers_2d'] = np.asarray(
                    [i.get('center_2d', i.get('center2d'))[:2]
                     for i in inst], np.float32)
                results['depths'] = np.asarray(
                    [i.get('depth', i.get('center_2d', [0, 0, 0])[-1]
                           if len(i.get('center_2d', [])) > 2 else 0.0)
                     for i in inst], np.float32)
        return results
