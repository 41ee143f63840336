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


@DATASETS.register_module()
class ScanNetDataset(Det3DDataset):
    """Indoor detection over ScanNet infos (ref scannet_dataset.py:15).

    v2 infos store GRAVITY-centered yaw-free 6-dim boxes
    (DepthInstance3DBoxes origin (0.5, 0.5, 0.5), ref :173-177); parsed
    to the framework's 7-dim bottom-center convention (yaw = 0).
    ``axis_align_matrix`` and seg-mask paths are exposed for
    GlobalAlignment / seg training."""
    METAINFO = {'classes': [
        'cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
        'bookshelf', 'picture', 'counter', 'desk', 'curtain',
        'refrigerator', 'showercurtrain', 'toilet', 'sink', 'bathtub',
        'garbagebin'],
        'seg_valid_class_ids': (3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16,
                                24, 28, 33, 34, 36, 39),
        'seg_all_class_ids': tuple(range(41))}

    def parse_ann_info(self, info):
        ann = super().parse_ann_info(info)
        if ann is None:
            return dict(gt_bboxes_3d=np.zeros((0, 7), np.float32),
                        gt_labels_3d=np.zeros((0,), np.int64))
        b = ann['gt_bboxes_3d']
        if b.shape[1] == 6:                       # pad yaw
            b = np.concatenate(
                [b, np.zeros((len(b), 1), np.float32)], -1)
        b = b.copy()
        b[:, 2] -= b[:, 5] / 2                    # gravity → bottom center
        return dict(gt_bboxes_3d=b.astype(np.float32),
                    gt_labels_3d=ann['gt_labels_3d'])

    def parse_data_info(self, info):
        import os
        out = super().parse_data_info(info)
        if 'axis_align_matrix' in info:
            out['axis_align_matrix'] = np.asarray(
                info['axis_align_matrix'], np.float32)
        for k, pref in (('pts_semantic_mask_path', 'pts_semantic_mask'),
                        ('pts_instance_mask_path', 'pts_instance_mask')):
            if k in info:
                p = info[k]
                if not os.path.isabs(p):
                    p = os.path.join(self.data_root,
                                     self.data_prefix.get(pref, ''), p)
                out[k] = p
        return out


@DATASETS.register_module()
class SUNRGBDDataset(Det3DDataset):
    """Indoor detection over SUN RGB-D infos (ref sunrgbd_dataset.py:14);
    7-dim gravity-centered boxes with yaw → bottom-center."""
    METAINFO = {'classes': [
        'bed', 'table', 'sofa', 'chair', 'toilet', 'desk', 'dresser',
        'night_stand', 'bookshelf', 'bathtub']}

    def parse_ann_info(self, info):
        ann = super().parse_ann_info(info)
        if ann is None:
            return dict(gt_bboxes_3d=np.zeros((0, 7), np.float32),
                        gt_labels_3d=np.zeros((0,), np.int64))
        b = ann['gt_bboxes_3d'].copy()
        b[:, 2] -= b[:, 5] / 2
        return dict(gt_bboxes_3d=b.astype(np.float32),
                    gt_labels_3d=ann['gt_labels_3d'])


@DATASETS.register_module()
class S3DISDataset(ScanNetDataset):
    """S3DIS indoor detection (ref s3dis_dataset.py:14) — ScanNet
    parsing with the S3DIS class table."""
    METAINFO = {'classes': ['table', 'chair', 'sofa', 'bookcase', 'board'],
                'seg_valid_class_ids': (7, 8, 9, 10, 11),
                'seg_all_class_ids': tuple(range(1, 14))}


class _SegMixin:
    """seg_label_mapping from (valid, all) class-id tables (ref
    Seg3DDataset.get_seg_label_mapping): raw ids → contiguous train ids,
    everything else → ignore (255)."""

    def _seg_mapping(self):
        valid = self.METAINFO.get('seg_valid_class_ids', ())
        allids = self.METAINFO.get('seg_all_class_ids', ())
        n = max(list(allids) + list(valid)) + 1 if (valid or allids) else 1
        m = np.full((n,), 255, np.int64)
        for i, v in enumerate(valid):
            m[v] = i
        return m

    def parse_data_info(self, info):
        out = super().parse_data_info(info)
        out['seg_label_mapping'] = self._seg_mapping()
        return out


@DATASETS.register_module()
class ScanNetSegDataset(_SegMixin, ScanNetDataset):
    """ScanNet semantic segmentation (ref scannet_dataset.py:183)."""


@DATASETS.register_module()
class S3DISSegDataset(_SegMixin, S3DISDataset):
    """S3DIS semantic segmentation (ref s3dis_dataset.py:238)."""
