"""Batching data loader (host-side, multiprocessing optional).

Replaces the torch DataLoader + mmengine collate path (ref:
train.py/mmengine dataloader with num_workers=4 persistent workers). Packed
samples are already fixed-shape numpy arrays, so collate is a plain stack.
"""
from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator, Optional, Sequence

import numpy as np


def collate_batch(samples: Sequence[dict]) -> dict:
    """Stack fixed-shape sample dicts; metainfo kept as a list."""
    out = {}
    for k in samples[0]:
        if k == 'metainfo':
            out[k] = [s[k] for s in samples]
        elif k.startswith('_'):
            continue
        else:
            out[k] = np.stack([s[k] for s in samples], 0)
    return out


class DataLoader:
    """Minimal epoch loader: shuffling, drop_last, thread-pool prefetch."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True,
                 num_workers: int = 0, rank: int = 0, world_size: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        # multi-host eval: stripe the index set per process (ref: torch
        # DistributedSampler as used by the reference's dist_test.sh)
        self.rank = rank
        self.world_size = world_size
        self._epoch = 0

    def _local_len(self):
        n = len(self.dataset)
        if self.world_size > 1 and self.drop_last:
            # equalized stripes: every rank sees exactly n // world
            # samples so all ranks run the SAME number of collective
            # steps per epoch (ref torch DistributedSampler drop_last)
            return n // self.world_size
        return len(range(self.rank, n, self.world_size))

    def __len__(self):
        n = self._local_len() // self.batch_size
        if not self.drop_last and self._local_len() % self.batch_size:
            n += 1
        return n

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __iter__(self) -> Iterator[dict]:
        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idxs)
        if self.world_size > 1:
            idxs = idxs[self.rank::self.world_size]
            if self.drop_last:
                idxs = idxs[:len(self.dataset) // self.world_size]
        bs = self.batch_size
        batches = [idxs[i:i + bs] for i in range(0, len(idxs), bs)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == bs]

        if self.num_workers > 0:
            with cf.ThreadPoolExecutor(self.num_workers) as pool:
                futs = [pool.submit(self._load, b) for b in batches]
                for f in futs:
                    yield f.result()
        else:
            for b in batches:
                yield self._load(b)

    def _load(self, idx_batch) -> dict:
        return collate_batch([self.dataset[int(i)] for i in idx_batch])
