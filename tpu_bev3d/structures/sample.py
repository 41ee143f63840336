"""Data containers for a single sample / a device batch.

TPU-native replacement for ``Det3DDataSample`` + ``InstanceData``
(ref: mmdet3d/structures/det3d_data_sample.py:11,138-194). On the host side a
sample is a plain attribute bag; on the device side everything is a pytree of
fixed-shape padded arrays — ``BatchInputs`` below defines that contract.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np


class InstanceData:
    """Attribute bag holding per-instance fields of equal length
    (bboxes_3d, labels_3d, scores_3d, ...)."""

    def __init__(self, **kwargs):
        self._fields: Dict[str, Any] = {}
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __setattr__(self, k, v):
        if k.startswith('_'):
            super().__setattr__(k, v)
        else:
            self._fields[k] = v

    def __getattr__(self, k):
        if k.startswith('_'):
            raise AttributeError(k)
        try:
            return self._fields[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __contains__(self, k):
        return k in self._fields

    def keys(self):
        return self._fields.keys()

    def __len__(self):
        for v in self._fields.values():
            try:
                return len(v)
            except TypeError:
                continue
        return 0

    def __getitem__(self, idx):
        out = InstanceData()
        for k, v in self._fields.items():
            out._fields[k] = v[idx]
        return out

    def __repr__(self):
        return f'InstanceData({list(self._fields)})'


class DataSample:
    """Per-sample container: gt_instances_3d, pred_instances_3d, metainfo.
    Mirrors Det3DDataSample's property surface without mmengine."""

    def __init__(self, metainfo: Optional[dict] = None):
        self.metainfo: Dict[str, Any] = dict(metainfo or {})
        self.gt_instances_3d = InstanceData()
        self.pred_instances_3d = InstanceData()
        self.gt_pts_seg = InstanceData()
        self.eval_ann_info: Optional[dict] = None

    def set_metainfo(self, info: dict):
        self.metainfo.update(info)

    def __repr__(self):
        return f'DataSample(meta={list(self.metainfo)})'
