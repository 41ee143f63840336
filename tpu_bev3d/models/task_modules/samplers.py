"""RoI samplers for two-stage training.

Ref: mmdet3d/models/task_modules/samplers/iou_neg_piecewise_sampler.py —
IoUNegPiecewiseSampler picks `num` RoIs per frame: a positive fraction
by GT-IoU, negatives split into piecewise IoU intervals with per-piece
quotas (Part-A2's second-stage recipe). TPU design: fixed output size,
selection by masked top-k over random keys (no data-dependent shapes);
under-filled pieces yield invalid slots flagged in the returned mask.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ...registry import TASK_UTILS


@TASK_UTILS.register_module()
class IoUNegPiecewiseSampler:
    def __init__(self, num: int = 128, pos_fraction: float = 0.55,
                 neg_piece_fractions: Sequence[float] = (0.8, 0.2),
                 neg_iou_piece_thrs: Sequence[float] = (0.55, 0.1),
                 pos_iou_thr: float = 0.55):
        assert len(neg_piece_fractions) == len(neg_iou_piece_thrs)
        self.num = num
        self.num_pos = int(round(num * pos_fraction))
        self.neg_counts = []
        n_neg = num - self.num_pos
        for i, f in enumerate(neg_piece_fractions):
            c = (n_neg - sum(self.neg_counts)
                 if i == len(neg_piece_fractions) - 1
                 else int(round(n_neg * f)))
            self.neg_counts.append(c)
        self.neg_thrs = list(neg_iou_piece_thrs)
        self.pos_iou_thr = pos_iou_thr

    def sample(self, rng, max_overlaps):
        """max_overlaps [P] per-proposal best GT IoU → (idx [num],
        is_pos [num], valid [num]). Fixed shape; invalid slots occur when
        a piece has fewer candidates than its quota."""
        P = max_overlaps.shape[0]
        keys = jax.random.uniform(rng, (P,))

        def pick(mask, k):
            # top-k random keys among mask → (idx [k], got [k] bool)
            score = jnp.where(mask, keys, -1.0)
            v, idx = jax.lax.top_k(score, k)
            return idx, v >= 0.0

        pos_mask = max_overlaps >= self.pos_iou_thr
        pi, pv = pick(pos_mask, self.num_pos)
        parts = [(pi, pv, jnp.ones(self.num_pos, bool))]
        hi = self.pos_iou_thr
        for lo, cnt in zip(self.neg_thrs, self.neg_counts):
            m = (max_overlaps < hi) & (max_overlaps >= lo)
            ni, nv = pick(m, cnt)
            parts.append((ni, nv, jnp.zeros(cnt, bool)))
            hi = lo
        idx = jnp.concatenate([p[0] for p in parts])
        valid = jnp.concatenate([p[1] for p in parts])
        is_pos = jnp.concatenate([p[2] for p in parts])
        return idx, is_pos & valid, valid
