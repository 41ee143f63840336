from .det3d_dataset import Det3DDataset
from .nuscenes_dataset import NuScenesDataset
from .kitti_dataset import KittiDataset
from .dataset_wrappers import CBGSDataset
from .other_datasets import (WaymoDataset, LyftDataset,
                             SemanticKittiDataset, CustomDataset,
                             ScanNetDataset, SUNRGBDDataset, S3DISDataset,
                             ScanNetSegDataset, S3DISSegDataset)
from .loader import DataLoader, collate_batch
from . import transforms  # noqa: F401 — register transforms

__all__ = ['Det3DDataset', 'NuScenesDataset', 'KittiDataset', 'CBGSDataset',
           'WaymoDataset', 'LyftDataset', 'SemanticKittiDataset',
           'CustomDataset', 'ScanNetDataset', 'SUNRGBDDataset',
           'S3DISDataset', 'ScanNetSegDataset', 'S3DISSegDataset',
           'DataLoader', 'collate_batch']
