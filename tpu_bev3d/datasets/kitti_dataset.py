"""KITTI dataset (ref: mmdet3d/datasets/kitti_dataset.py:12-180)."""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..registry import DATASETS
from .det3d_dataset import Det3DDataset


@DATASETS.register_module()
class KittiDataset(Det3DDataset):
    METAINFO = {'classes': ['Pedestrian', 'Cyclist', 'Car']}

    def parse_ann_info(self, info: dict) -> Optional[dict]:
        """Reference v2 KITTI infos store ``bbox_3d`` in CAMERA frame
        (x,y,z,l,h,w,ry with y down, bottom-centered); convert to LiDAR
        via inv(lidar2cam) and drop label==-1 (DontCare + out-of-set
        classes). Ref kitti_dataset.py:135-173 (_remove_dontcare +
        CameraInstance3DBoxes.convert_to). Infos from our own converter
        (tools/create_data.py — no 'images' key) are already LiDAR-frame
        and pass through unchanged."""
        ann = super().parse_ann_info(info)
        if ann is None:
            return None
        cam2 = info.get('images', {}).get('CAM2', {})
        if 'lidar2cam' not in cam2:
            return ann
        keep = ann['gt_labels_3d'] > -1
        boxes = ann['gt_bboxes_3d'][keep]
        labels = ann['gt_labels_3d'][keep]
        l2c = np.asarray(cam2['lidar2cam'], np.float32)
        c2l = np.linalg.inv(l2c)
        xyz1 = np.concatenate(
            [boxes[:, :3], np.ones((len(boxes), 1), np.float32)], -1)
        xyz = (xyz1 @ c2l.T)[:, :3]
        # cam dims (l,h,w) → lidar (l,w,h); yaw = -ry - pi/2, wrapped
        dims = boxes[:, [3, 5, 4]]
        yaw = -boxes[:, 6] - np.pi / 2
        yaw = (yaw + np.pi) % (2 * np.pi) - np.pi
        out = np.concatenate([xyz, dims, yaw[:, None]], -1)
        return dict(gt_bboxes_3d=out.astype(np.float32),
                    gt_labels_3d=labels)

    def parse_data_info(self, info: dict) -> dict:
        out = super().parse_data_info(info)
        # KITTI infos carry calib for the cam-visible filtering / eval
        if 'calib' in info:
            out['calib'] = info['calib']
        # Reference v2 infos: expose CAM2 calib in our calib dict shape
        # so downstream eval/visual code has R0_rect/Tr_velo_to_cam-like
        # access (lidar2cam = R0_rect @ Tr_velo_to_cam, ref :166).
        cam2 = info.get('images', {}).get('CAM2', {})
        if 'calib' not in out and 'lidar2cam' in cam2:
            out['lidar2cam'] = np.asarray(cam2['lidar2cam'], np.float32)
            if 'cam2img' in cam2:
                out['cam2img'] = np.asarray(cam2['cam2img'], np.float32)
        return out
