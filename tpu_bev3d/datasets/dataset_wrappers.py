"""Class-balanced dataset wrapper (CBGS).

Ref: mmdet3d/datasets/dataset_wrappers.py:26 CBGSDataset —
_get_sample_indices:64-100: per-class frame lists, duplication so every
class reaches ~1/num_classes frequency.
"""
from __future__ import annotations

import numpy as np

from ..registry import DATASETS


@DATASETS.register_module()
class CBGSDataset:
    def __init__(self, dataset, seed: int = 0, **kwargs):
        self.dataset = DATASETS.build(dict(dataset)) \
            if isinstance(dataset, dict) else dataset
        self.sample_indices = self._get_sample_indices(seed)

    def _get_sample_indices(self, seed):
        classes = self.dataset.classes
        num_classes = len(classes)
        cat2ids = {i: [] for i in range(num_classes)}
        for idx in range(len(self.dataset)):
            for cat in self.dataset.get_cat_ids(idx):
                if 0 <= cat < num_classes:
                    cat2ids[cat].append(idx)
        total = sum(len(v) for v in cat2ids.values())
        if total == 0:
            return list(range(len(self.dataset)))
        frac = 1.0 / num_classes
        ratios = [frac / (len(v) / total) if len(v) else 0.0
                  for v in cat2ids.values()]
        rng = np.random.default_rng(seed)
        out = []
        for (cat, ids), ratio in zip(cat2ids.items(), ratios):
            if not ids:
                continue
            n = int(len(ids) * ratio)
            out += list(rng.choice(ids, n))
        return [int(i) for i in out]

    def __len__(self):
        return len(self.sample_indices)

    def __getitem__(self, idx):
        return self.dataset[self.sample_indices[idx]]

    def __getattr__(self, name):
        return getattr(self.dataset, name)
