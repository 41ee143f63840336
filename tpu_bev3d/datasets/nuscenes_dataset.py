"""nuScenes dataset (ref: mmdet3d/datasets/nuscenes_dataset.py:14-248).

parse_ann_info adds velocity → 9-DoF boxes and applies the
``use_valid_flag`` / num_pts filter (ref _filter_with_mask:112-131);
parse_data_info attaches multi-view camera info (ref :193-247).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..registry import DATASETS
from .det3d_dataset import Det3DDataset


@DATASETS.register_module()
class NuScenesDataset(Det3DDataset):
    METAINFO = {
        'classes': ['car', 'truck', 'construction_vehicle', 'bus', 'trailer',
                    'barrier', 'motorcycle', 'bicycle', 'pedestrian',
                    'traffic_cone'],
        'version': 'v1.0-trainval',
    }

    def __init__(self, *args, with_velocity: bool = True,
                 use_valid_flag: bool = False, **kwargs):
        self.with_velocity = with_velocity
        self.use_valid_flag = use_valid_flag
        super().__init__(*args, **kwargs)

    def parse_ann_info(self, info: dict) -> Optional[dict]:
        ann = super().parse_ann_info(info)
        if ann is None:
            return dict(
                gt_bboxes_3d=np.zeros(
                    (0, 9 if self.with_velocity else 7), np.float32),
                gt_labels_3d=np.zeros((0,), np.int64))
        instances = info.get('instances', [])
        # validity filter (ref _filter_with_mask:112-131)
        if self.use_valid_flag and instances \
                and 'bbox_3d_isvalid' in instances[0]:
            mask = np.asarray([i['bbox_3d_isvalid'] for i in instances], bool)
        elif instances and 'num_lidar_pts' in instances[0]:
            cnt = np.asarray([i['num_lidar_pts'] for i in instances])
            # -1 = count unknown (e.g. Lyft tables carry none): keep;
            # only drop boxes KNOWN to contain zero returns
            mask = (cnt > 0) | (cnt < 0)
        else:
            mask = np.ones(len(ann['gt_labels_3d']), bool)
        boxes = ann['gt_bboxes_3d'][mask].copy()
        labels = ann['gt_labels_3d'][mask]
        # nuScenes infos store GRAVITY-centered boxes (devkit translation
        # = box center); the framework convention is bottom-center like
        # KITTI, so shift z by -h/2 (ref nuscenes_dataset.py:175-187:
        # LiDARInstance3DBoxes(..., origin=(0.5, 0.5, 0.5)).convert_to).
        # Verified on the real demo frame: 28/28 annotated boxes'
        # points_in_rbbox counts match num_lidar_pts within rounding.
        if len(boxes):
            boxes[:, 2] -= boxes[:, 5] * 0.5
        if self.with_velocity and boxes.shape[1] == 7:
            vel = np.stack([np.asarray(i.get('velocity', [0, 0]), np.float32)
                            for i in instances], 0)[mask] \
                if instances else np.zeros((0, 2), np.float32)
            vel = np.nan_to_num(vel)
            boxes = np.concatenate([boxes, vel], -1)
        return dict(gt_bboxes_3d=boxes.astype(np.float32),
                    gt_labels_3d=labels)

    def parse_data_info(self, info: dict) -> dict:
        out = super().parse_data_info(info)
        # multi-view camera info (ref nuscenes_dataset.py:193-247)
        if self.modality.get('use_camera') and 'images' in info:
            imgs = out.get('images', info['images'])  # prefixed paths
            out['img_paths'] = []
            out['lidar2img'] = []
            out['cam2img'] = []
            out['cam2lidar'] = []
            has_2d = any('instances_2d' in ci for ci in imgs.values())
            if has_2d:
                out['anns_2d'] = []
            for cam, ci in imgs.items():
                out['img_paths'].append(ci.get('img_path'))
                c2i = np.asarray(ci.get('cam2img', np.eye(3)), np.float32)
                l2c = np.asarray(ci.get('lidar2cam', np.eye(4)), np.float32)
                k = np.eye(4, dtype=np.float32)
                k[:c2i.shape[0], :c2i.shape[1]] = c2i
                out['cam2img'].append(c2i)
                out['lidar2img'].append(k @ l2c)
                out['cam2lidar'].append(np.linalg.inv(l2c))
                if has_2d:
                    # per-camera 2D anns (converter --with-2d; the
                    # StreamPETR aux-2D supervision payload)
                    out['anns_2d'].append(ci.get('instances_2d', []))
        return out
