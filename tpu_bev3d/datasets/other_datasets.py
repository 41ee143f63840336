"""Waymo / Lyft / SemanticKITTI dataset classes over the info-pkl format.

Refs: mmdet3d/datasets/{waymo,lyft,semantickitti}_dataset.py. Waymo adds
per-instance LEVEL difficulty + point-count bookkeeping (consumed by the
native waymo_eval) and cam-sync instance filtering; Lyft is the
nuScenes-like schema without velocities/attributes.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..registry import DATASETS
from .det3d_dataset import Det3DDataset
from .nuscenes_dataset import NuScenesDataset


@DATASETS.register_module()
class WaymoDataset(Det3DDataset):
    """Ref mmdet3d/datasets/waymo_dataset.py — LEVEL difficulty +
    num_lidar_pts carried through for the Waymo metric; optional
    cam-sync instance selection (load_interval thinning supported by the
    base)."""
    METAINFO = {'classes': ['Car', 'Pedestrian', 'Cyclist']}

    def __init__(self, *args, cam_sync_instances: bool = False,
                 min_lidar_pts: int = 0, **kwargs):
        self.cam_sync_instances = cam_sync_instances
        self.min_lidar_pts = min_lidar_pts
        super().__init__(*args, **kwargs)

    def parse_ann_info(self, info: dict) -> Optional[dict]:
        key = 'cam_sync_instances' if (self.cam_sync_instances
                                       and 'cam_sync_instances' in info) \
            else 'instances'
        instances = info.get(key, [])
        if not instances:
            return None
        boxes, labels, num_pts, levels = [], [], [], []
        for inst in instances:
            if inst.get('num_lidar_pts', 99) < self.min_lidar_pts:
                continue
            boxes.append(np.asarray(inst['bbox_3d'], np.float32))
            labels.append(int(inst.get('bbox_label_3d',
                                       inst.get('bbox_label', -1))))
            num_pts.append(int(inst.get('num_lidar_pts', 99)))
            levels.append(int(inst.get('difficulty', 1)))
        if not boxes:
            return None
        return dict(gt_bboxes_3d=np.stack(boxes).astype(np.float32),
                    gt_labels_3d=np.asarray(labels, np.int64),
                    num_lidar_pts=np.asarray(num_pts, np.int64),
                    difficulty=np.asarray(levels, np.int64))


@DATASETS.register_module()
class LyftDataset(NuScenesDataset):
    """Ref mmdet3d/datasets/lyft_dataset.py — nuScenes-like info schema,
    9 classes, no velocity/attribute annotations."""
    METAINFO = {'classes': [
        'car', 'truck', 'bus', 'emergency_vehicle', 'other_vehicle',
        'motorcycle', 'bicycle', 'pedestrian', 'animal']}

    def __init__(self, *args, **kwargs):
        kwargs.setdefault('with_velocity', False)
        super().__init__(*args, **kwargs)


@DATASETS.register_module()
class SemanticKittiDataset(Det3DDataset):
    """Seg dataset: samples carry pts_semantic_mask paths
    (ref semantickitti_dataset.py)."""
    METAINFO = {'classes': [
        'car', 'bicycle', 'motorcycle', 'truck', 'bus', 'person',
        'bicyclist', 'motorcyclist', 'road', 'parking', 'sidewalk',
        'other-ground', 'building', 'fence', 'vegetation', 'trunck',
        'terrian', 'pole', 'traffic-sign']}

    def parse_data_info(self, info):
        out = super().parse_data_info(info)
        if 'pts_semantic_mask_path' in info:
            import os
            p = info['pts_semantic_mask_path']
            if self.data_root and not os.path.isabs(p):
                p = os.path.join(self.data_root, p)
            out['pts_semantic_mask_path'] = p
        return out


@DATASETS.register_module()
class CustomDataset(Det3DDataset):
    """BEVFusion project's custom-scene dataset (ref
    projects/BEVFusion/datasets/custom_dataset.py:13 — 5 classes over
    the standard info-pkl schema; points loaded from .bin like KITTI).
    Build infos with tools/custom_scene_converter.py."""
    METAINFO = {'classes': ['car', 'truck', 'bus', 'pedestrian',
                            'bicycle']}
