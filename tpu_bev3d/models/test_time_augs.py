"""Detection test-time augmentation (VERDICT r4 item 7).

Ref: mmdet3d/models/test_time_augs/merge_augs.py:1-98
(``merge_aug_bboxes_3d`` — map each augmented view's boxes back through
its flip/scale, concatenate, per-class BEV NMS, top-``max_num``), used by
mmdet3d/models/detectors/votenet.py ``aug_test`` and anchor heads.

TPU design: the augmentation set is STATIC (a python tuple of
(h_flip, v_flip, scale) views), so the whole TTA forward — every
augmented predict plus the merge — traces into one jittable graph with
fixed shapes: A views × M boxes concatenate to one [A·M] candidate set,
the per-class NMS loops classes statically, and the final top-k is a
fixed ``max_num`` slice. No dynamic shapes anywhere.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import MODELS
from ..structures import boxes3d as B
from ..ops.nms import nms_bev_mask, nms_normal_bev_mask


def bbox3d_mapping_back(boxes, scale_factor: float, horizontal_flip: bool,
                        vertical_flip: bool):
    """Reverse flip+scale on [..., 7+] box arrays (ref
    mmdet3d/structures/ops/transforms.py bbox3d_mapping_back; flips are
    involutions so mapping back re-applies them)."""
    if horizontal_flip:
        boxes = B.flip(boxes, 'horizontal', jnp)
    if vertical_flip:
        boxes = B.flip(boxes, 'vertical', jnp)
    if scale_factor != 1.0:
        inv = 1.0 / scale_factor
        parts = [boxes[..., :6] * inv, boxes[..., 6:7]]
        if boxes.shape[-1] > 7:
            parts.append(boxes[..., 7:] * inv)   # velocities scale too
        boxes = jnp.concatenate(parts, -1)
    return boxes


def merge_aug_bboxes_3d(aug_results, aug_metas, num_classes: int,
                        nms_thr: float = 0.25, max_num: int = 500,
                        use_rotate_nms: bool = False):
    """Merge per-view predict dicts (ref merge_augs.py:11-98).

    aug_results: sequence of dicts with ``bboxes [M, 7+] / scores [M] /
    labels [M] / mask [M]`` (ONE sample per entry — vmap for batches).
    aug_metas: matching sequence of dicts with ``pcd_horizontal_flip /
    pcd_vertical_flip / pcd_scale_factor`` (python values — static).
    Returns the same dict shape with M = ``max_num``.
    """
    assert len(aug_results) == len(aug_metas)
    boxes, scores, labels, valid = [], [], [], []
    for r, meta in zip(aug_results, aug_metas):
        boxes.append(bbox3d_mapping_back(
            r['bboxes'],
            float(meta.get('pcd_scale_factor', 1.0)),
            bool(meta.get('pcd_horizontal_flip', False)),
            bool(meta.get('pcd_vertical_flip', False))))
        scores.append(r['scores'])
        labels.append(r['labels'])
        valid.append(r['mask'])
    boxes = jnp.concatenate(boxes, 0)
    scores = jnp.concatenate(scores, 0)
    labels = jnp.concatenate(labels, 0)
    valid = jnp.concatenate(valid, 0)

    bev = jnp.concatenate([boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]],
                          -1)                                # x,y,dx,dy,r
    nms_fn = nms_bev_mask if use_rotate_nms else nms_normal_bev_mask
    keep = jnp.zeros_like(valid)
    for c in range(num_classes):                 # static class loop (ref
        sel = valid & (labels == c)              # merge_augs.py:73-86)
        keep = keep | (nms_fn(bev, scores, sel, nms_thr) & sel)

    top, idx = jax.lax.top_k(jnp.where(keep, scores, -jnp.inf), max_num)
    ok = jnp.isfinite(top)
    return dict(bboxes=jnp.where(ok[:, None], boxes[idx], 0.0),
                scores=jnp.where(ok, top, 0.0),
                labels=jnp.where(ok, labels[idx], 0),
                mask=ok)


def _flip_points(points, horizontal: bool, vertical: bool,
                 scale: float = 1.0):
    """Forward-apply the view's aug to [..., P, C] points (xyz leading)."""
    x = points[..., 0:1] * (-1.0 if vertical else 1.0)
    y = points[..., 1:2] * (-1.0 if horizontal else 1.0)
    out = jnp.concatenate([x, y, points[..., 2:]], -1)
    if scale != 1.0:
        out = jnp.concatenate([out[..., :3] * scale, out[..., 3:]], -1)
    return out


@MODELS.register_module()
class Det3DTTAModel(nn.Module):
    """Detection TTA wrapper (the det twin of ``Seg3DTTAModel``): run the
    wrapped detector's predict under a static set of flip/scale views and
    merge with ``merge_aug_bboxes_3d``. Point-cloud models only (the
    views transform ``points``; camera batches pass through unflipped,
    like the reference's pcd-only aug_test).

    views: tuple of (h_flip, v_flip, scale) triples; the identity view
    should come first.
    """
    detector: Any = None
    num_classes: int = 10
    views: Tuple = ((False, False, 1.0), (True, False, 1.0))
    nms_thr: float = 0.25
    max_num: int = 64
    use_rotate_nms: bool = False

    def setup(self):
        self._det = MODELS.build(dict(self.detector))

    def __call__(self, batch, mode: str = 'predict', train: bool = False):
        if mode != 'predict':                    # loss/tensor: no TTA
            return self._det(batch, mode=mode, train=train)
        results, metas = [], []
        for (fh, fv, sc) in self.views:
            b = dict(batch)
            b['points'] = _flip_points(batch['points'], fh, fv, float(sc))
            results.append(self._det(b, mode='predict', train=False))
            metas.append(dict(pcd_horizontal_flip=fh,
                              pcd_vertical_flip=fv,
                              pcd_scale_factor=float(sc)))

        def one(per_view):
            return merge_aug_bboxes_3d(
                per_view, metas, self.num_classes, self.nms_thr,
                self.max_num, self.use_rotate_nms)

        # vmap over the batch axis of every view's result dict
        stacked = [r for r in results]
        return jax.vmap(lambda *rs: one(list(rs)))(*stacked)
