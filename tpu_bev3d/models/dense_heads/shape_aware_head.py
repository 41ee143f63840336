"""SSN shape-aware grouping head.

Ref: mmdet3d/models/dense_heads/shape_aware_head.py:20-537 —
ShapeAwareHead groups classes by shape; each group gets its own
BaseShapeHead (shared conv tower, optionally strided for large shapes, +
1×1 cls/reg/dir convs) and its own anchors at the tower's output
resolution. Per-task outputs are flattened per-anchor and concatenated;
loss/assignment runs over the combined anchor set (shared with
Anchor3DHead.loss_from_flat).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.nms import box3d_multiclass_nms
from ...registry import MODELS, TASK_UTILS
from ..layers.common import ConvBNAct
from .anchor3d_head import Anchor3DHead, limit_period


class BaseShapeHead(nn.Module):
    """Per-shape-group tower (ref BaseShapeHead:20-160)."""
    num_cls: int
    num_base_anchors: int
    box_code_size: int
    shared_conv_channels: Sequence[int] = (64, 64)
    shared_conv_strides: Sequence[int] = (1, 1)
    use_dir: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (ch, st) in enumerate(zip(self.shared_conv_channels,
                                         self.shared_conv_strides)):
            x = ConvBNAct(ch, 3, stride=st, padding=1,
                          name=f'shared_{i}')(x, train)
        A, K = self.num_base_anchors, self.num_cls
        cls = nn.Conv(A * K, (1, 1), name='conv_cls')(x)
        reg = nn.Conv(A * self.box_code_size, (1, 1), name='conv_reg')(x)
        d = nn.Conv(A * 2, (1, 1), name='conv_dir')(x) if self.use_dir \
            else None
        B, H, W, _ = cls.shape
        out = dict(cls=cls.reshape(B, -1, K),
                   reg=reg.reshape(B, -1, self.box_code_size),
                   featmap=(H, W))
        if d is not None:
            out['dir'] = d.reshape(B, -1, 2)
        return out


@MODELS.register_module()
class ShapeAwareHead(Anchor3DHead):
    """tasks: per shape group
    dict(class_ids, sizes, rotations, ranges, shared_conv_channels,
    shared_conv_strides). Inherits losses/decode from Anchor3DHead."""
    tasks: Any = None

    def setup(self):
        from ..task_modules.coders import DeltaXYZWLHRBBoxCoder
        self._coder = DeltaXYZWLHRBBoxCoder(self.box_code_size)
        heads = []
        for t in self.tasks:
            n_rot = len(t.get('rotations', (0.0, 1.5707963)))
            heads.append(BaseShapeHead(
                num_cls=self.num_classes,
                num_base_anchors=len(t['sizes']) * n_rot,
                box_code_size=self.box_code_size,
                shared_conv_channels=tuple(
                    t.get('shared_conv_channels', (64, 64))),
                shared_conv_strides=tuple(
                    t.get('shared_conv_strides', (1, 1)))))
        self.heads = heads

    def __call__(self, x, train: bool = False):
        outs = [h(x, train=train) for h in self.heads]
        cls = jnp.concatenate([o['cls'] for o in outs], 1)
        reg = jnp.concatenate([o['reg'] for o in outs], 1)
        d = jnp.concatenate([o['dir'] for o in outs], 1) \
            if 'dir' in outs[0] else None
        featmaps = tuple(o['featmap'] for o in outs)
        return cls, reg, d, featmaps

    def _task_anchors(self, featmaps):
        """Anchors + class ids for the concatenated task outputs."""
        ancs, clss = [], []
        for t, (H, W) in zip(self.tasks, featmaps):
            gen = TASK_UTILS.build(dict(
                type='AlignedAnchor3DRangeGenerator',
                ranges=[list(r) for r in t['ranges']],
                sizes=[list(s) for s in t['sizes']],
                rotations=list(t.get('rotations', (0.0, 1.5707963))),
                reshape_out=False,
                size_per_range=len(t['ranges']) == len(t['sizes'])))
            a = gen.grid_anchors((H, W)).reshape(-1, 7)
            if self.box_code_size > 7:
                a = np.concatenate(
                    [a, np.zeros((a.shape[0],
                                  self.box_code_size - 7), np.float32)],
                    -1)
            n_rot = len(t.get('rotations', (0.0, 1.5707963)))
            cls_ids = np.repeat(np.asarray(t['class_ids'], np.int64),
                                n_rot * (len(t['sizes'])
                                         // len(t['class_ids'])))
            clss.append(np.tile(cls_ids, H * W))
            ancs.append(a)
        return (jnp.asarray(np.concatenate(ancs)),
                jnp.asarray(np.concatenate(clss)))

    def loss_by_feat(self, outs, gt_bboxes, gt_labels, gt_mask):
        cls, reg, d, featmaps = outs
        anchors, anchor_cls = self._task_anchors(featmaps)
        return self.loss_from_flat(cls, reg, d, anchors, anchor_cls,
                                   False, gt_bboxes, gt_labels, gt_mask)

    def predict_by_feat(self, outs):
        cls, reg, d, featmaps = outs
        anchors, _ = self._task_anchors(featmaps)
        B, A = cls.shape[:2]
        dir_score = (jnp.argmax(d, -1) if d is not None
                     else jnp.zeros((B, A), jnp.int32))

        def one(cls_s, box_p, dir_s):
            scores = jax.nn.sigmoid(cls_s)
            top_v, top_i = jax.lax.top_k(jnp.max(scores, -1),
                                         min(self.nms_pre, A))
            anc = anchors[top_i]
            boxes = self._coder.decode(anc, box_p[top_i])
            sc = scores[top_i]
            ds = dir_s[top_i]
            bev = boxes[:, [0, 1, 3, 4, 6]]
            res = box3d_multiclass_nms(
                boxes, bev, sc, self.score_thr, self.nms_iou_thr,
                self.max_num, mlvl_dir_scores=ds,
                use_rotate_nms=self.use_rotate_nms)
            yaw = res['bboxes'][:, 6]
            lim = limit_period(yaw - self.dir_offset,
                               self.dir_limit_offset, np.pi)
            yaw = lim + self.dir_offset \
                + np.pi * res['dir_scores'].astype(yaw.dtype)
            bboxes = res['bboxes'].at[:, 6].set(yaw)
            return dict(bboxes=bboxes, scores=res['scores'],
                        labels=res['labels'], mask=res['mask'])

        return jax.vmap(one)(cls, reg, dir_score)
