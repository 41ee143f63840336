"""Additional dataset classes over the shared info-pkl format.

Refs: mmdet3d/datasets/{waymo,lyft,semantickitti}_dataset.py — these differ
from the base mainly in metainfo and minor ann handling; the converter
tools emit the same info-pkl schema.
"""
from __future__ import annotations

import numpy as np

from ..registry import DATASETS
from .det3d_dataset import Det3DDataset


@DATASETS.register_module()
class WaymoDataset(Det3DDataset):
    METAINFO = {'classes': ['Car', 'Pedestrian', 'Cyclist']}


@DATASETS.register_module()
class LyftDataset(Det3DDataset):
    METAINFO = {'classes': [
        'car', 'truck', 'bus', 'emergency_vehicle', 'other_vehicle',
        'motorcycle', 'bicycle', 'pedestrian', 'animal']}


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
