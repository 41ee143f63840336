"""KITTI dataset (ref: mmdet3d/datasets/kitti_dataset.py:12-180)."""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..registry import DATASETS
from .det3d_dataset import Det3DDataset


@DATASETS.register_module()
class KittiDataset(Det3DDataset):
    METAINFO = {'classes': ['Pedestrian', 'Cyclist', 'Car']}

    def parse_data_info(self, info: dict) -> dict:
        out = super().parse_data_info(info)
        # KITTI infos carry calib for the cam-visible filtering / eval
        if 'calib' in info:
            out['calib'] = info['calib']
        return out
