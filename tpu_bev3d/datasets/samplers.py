"""Batch samplers.

Ref: projects/StreamPETR/stream_petr/datasets/samplers/
group_streaming_sampler.py:13 — GroupStreamingSampler keeps each batch
lane scene-contiguous so the temporal query memory stays valid across
steps.
"""
from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


class GroupStreamingSampler:
    """Yields index batches [B] such that lane b steps through one scene's
    frames in temporal order; when a scene ends the lane moves to the next
    scene (the model resets its memory via the scene-change flag)."""

    def __init__(self, scene_ids: Sequence, batch_size: int,
                 shuffle: bool = True, seed: int = 0):
        self.batch_size = batch_size
        scenes = {}
        for idx, sid in enumerate(scene_ids):
            scenes.setdefault(sid, []).append(idx)
        groups = list(scenes.values())
        if shuffle:
            np.random.default_rng(seed).shuffle(groups)
        # round-robin scenes over lanes
        lanes: List[List[int]] = [[] for _ in range(batch_size)]
        lane_breaks: List[List[int]] = [[] for _ in range(batch_size)]
        for gi, g in enumerate(groups):
            lane = min(range(batch_size), key=lambda i: len(lanes[i]))
            lane_breaks[lane].append(len(lanes[lane]))
            lanes[lane].extend(g)
        self.num_batches = min(len(l) for l in lanes) if batch_size else 0
        self.lanes = lanes
        self.lane_breaks = [set(b) for b in lane_breaks]

    def __len__(self):
        return self.num_batches

    def __iter__(self) -> Iterator:
        for t in range(self.num_batches):
            idxs = [self.lanes[b][t] for b in range(self.batch_size)]
            is_first = [t in self.lane_breaks[b]
                        for b in range(self.batch_size)]
            yield idxs, is_first
