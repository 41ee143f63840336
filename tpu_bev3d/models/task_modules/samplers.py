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
        self.n_neg = n_neg
        self.pos_iou_thr = pos_iou_thr

    def sample(self, rng, max_overlaps):
        """max_overlaps [P] per-proposal best GT IoU → (idx [num],
        is_pos [num], valid [num]). Fixed shape; invalid slots occur when
        a piece has fewer candidates than its quota.

        Piece i covers [thr[i+1], thr[i]) with thr[i] the UPPER bound
        (ref iou_neg_piecewise_sampler.py:92-96); the last piece's lower
        bound is 0. Under-filled pieces are back-filled from the whole
        negative pool (fixed-shape analogue of the ref's extend_num +
        random-with-replacement final fill, :99-120).
        """
        P = max_overlaps.shape[0]
        r1, r2 = jax.random.split(rng)
        keys = jax.random.uniform(r1, (P,))
        keys2 = jax.random.uniform(r2, (P,))

        def pick(mask, k, kk):
            # top-k random keys among mask → (idx [k], got [k] bool)
            score = jnp.where(mask, kk, -1.0)
            v, idx = jax.lax.top_k(score, k)
            return idx, v >= 0.0

        pos_mask = max_overlaps >= self.pos_iou_thr
        pi, pv = pick(pos_mask, self.num_pos, keys)
        neg_idx, neg_val = [], []
        for i, cnt in enumerate(self.neg_counts):
            hi = self.neg_thrs[i]
            lo = self.neg_thrs[i + 1] if i + 1 < len(self.neg_thrs) else 0.0
            m = (max_overlaps >= lo) & (max_overlaps < hi) & ~pos_mask
            ni, nv = pick(m, cnt, keys)
            neg_idx.append(ni)
            neg_val.append(nv)
        ni = jnp.concatenate(neg_idx)
        nv = jnp.concatenate(neg_val)
        # Back-fill under-filled slots from the full negative pool
        # (duplicates possible, as in the reference's replacement fill).
        all_neg = (max_overlaps < self.neg_thrs[0]) & ~pos_mask
        fi, fv = pick(all_neg, self.n_neg, keys2)
        ni = jnp.where(nv, ni, fi)
        nv = nv | fv
        idx = jnp.concatenate([pi, ni])
        valid = jnp.concatenate([pv, nv])
        is_pos = jnp.concatenate(
            [jnp.ones(self.num_pos, bool), jnp.zeros(self.n_neg, bool)])
        return idx, is_pos & valid, valid
