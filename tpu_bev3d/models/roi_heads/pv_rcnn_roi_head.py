"""PV-RCNN RoI head — keypoint weighting + RoI-grid pooling refinement.

Ref: mmdet3d/models/roi_heads/pv_rcnn_roi_head.py + bbox_heads/
pvrcnn_bbox_head.py — predicted keypoint weighting (foreground score
multiplies keypoint features), 6³ RoI grid points ball-querying the
keypoint set, shared-MLP aggregation, FC head for IoU-guided score + box
residual.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.iou3d import nearest_iou_bev
from ...ops.pointnet_ops import ball_query, grouping_operation
from ...registry import MODELS
from ..layers.pointnet_modules import SharedMLP
from ..losses.losses import (binary_cross_entropy_with_logits,
                             smooth_l1_loss)
from .part_aggregation_roi_head import points_in_boxes_local


def roi_grid_points(boxes, grid_size: int):
    """[R,7] → [R,G³,3] world-frame grid point centers inside each box."""
    G = grid_size
    lin = (np.arange(G, dtype=np.float32) + 0.5) / G - 0.5
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing='ij')
    local = jnp.asarray(np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1))
    local = local[None] * boxes[:, None, 3:6]
    # z: boxes are bottom-centered → shift up half a height
    local = local.at[..., 2].add(boxes[:, None, 5] / 2)
    c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    x = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    y = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    return jnp.stack([x, y, local[..., 2]], -1) + boxes[:, None, None, 0:3][:, 0]


class _GridSA(nn.Module):
    radii: Sequence[float]
    num_samples: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, grid_xyz, kp_xyz, kp_feats, kp_mask,
                 train: bool = False):
        """grid_xyz [Q,3] over keypoints [K,·] → [Q, C']."""
        outs = []
        for bi, (r, k, mlp) in enumerate(zip(self.radii, self.num_samples,
                                             self.mlp_channels)):
            nidx, nvalid = ball_query(grid_xyz, kp_xyz, kp_mask, r, k)
            g_xyz = grouping_operation(kp_xyz, nidx) - grid_xyz[:, None]
            g = jnp.concatenate(
                [g_xyz, grouping_operation(kp_feats, nidx)], -1)
            g = SharedMLP(tuple(mlp), name=f'mlp{bi}')(g, nvalid, train)
            g = jnp.where(nvalid[..., None], g, -jnp.inf)
            o = jnp.max(g, axis=1)
            outs.append(jnp.where(jnp.isfinite(o), o, 0.0))
        return jnp.concatenate(outs, -1)


@MODELS.register_module()
class PVRCNNRoIHead(nn.Module):
    in_channels: int = 128
    grid_size: int = 6
    radii: Sequence[float] = (0.8, 1.6)
    num_samples: Sequence[int] = (16, 16)
    mlp_channels: Sequence[Sequence[int]] = ((64, 64), (64, 64))
    fc_channels: Sequence[int] = (256, 256)
    pos_iou_thr: float = 0.55
    cls_pos_thr: float = 0.75
    cls_neg_thr: float = 0.25

    @nn.compact
    def __call__(self, kp_xyz, kp_feats, kp_mask, proposals,
                 train: bool = False):
        boxes = proposals['bboxes'][..., :7]
        B, R = boxes.shape[:2]
        G3 = self.grid_size ** 3
        # predicted keypoint weighting (foreground score; PKW, ref
        # pv_rcnn_roi_head semantic branch)
        kp_logit = nn.Dense(1, name='kp_cls')(kp_feats)[..., 0]
        kp_w = jax.nn.sigmoid(kp_logit) * kp_mask
        kpf = kp_feats * kp_w[..., None]

        grid = jax.vmap(lambda b: roi_grid_points(b, self.grid_size))(
            boxes)                                       # [B,R,G³,3]
        sa = nn.vmap(
            _GridSA, in_axes=(0, 0, 0, 0, None), out_axes=0,
            variable_axes={'params': None, 'batch_stats': None},
            split_rngs={'params': False}, methods=['__call__'])(
                tuple(self.radii), tuple(self.num_samples),
                tuple(tuple(m) for m in self.mlp_channels), name='grid_sa')
        pooled = sa(grid.reshape(B, R * G3, 3), kp_xyz, kpf, kp_mask,
                    False)                               # [B, R·G³, C]
        x = pooled.reshape(B, R, -1)
        for i, ch in enumerate(self.fc_channels):
            x = nn.Dense(ch, name=f'fc{i}')(x)
            x = nn.relu(x)
        cls_logit = nn.Dense(1, name='cls')(x)[..., 0]
        delta = nn.Dense(7, name='reg')(x)

        diag = jnp.sqrt(boxes[..., 3] ** 2 + boxes[..., 4] ** 2)
        refined = jnp.concatenate([
            boxes[..., :2] + delta[..., :2] * diag[..., None],
            boxes[..., 2:3] + delta[..., 2:3] * boxes[..., 5:6],
            boxes[..., 3:6] * jnp.exp(jnp.clip(delta[..., 3:6], -2, 2)),
            boxes[..., 6:7] + delta[..., 6:7],
        ], -1)
        score = jax.nn.sigmoid(cls_logit) * proposals['scores']
        return dict(bboxes=refined, scores=score,
                    labels=proposals['labels'], mask=proposals['mask'],
                    _delta=delta, _cls_logit=cls_logit, _proposals=boxes,
                    _kp_logit=kp_logit)

    def loss(self, out, kp_xyz, kp_mask, gt_bboxes, gt_labels, gt_mask):
        """RoI refinement loss + keypoint segmentation (PKW supervision)."""
        def one(prop, delta, cls_logit, pmask, kpl, kpx, kpm, gtb, gtm):
            iou = nearest_iou_bev(prop, gtb[:, :7])
            iou = jnp.where(gtm[None] & pmask[:, None], iou, -1.0)
            best = jnp.argmax(iou, -1)
            best_iou = jnp.max(iou, -1)
            pos = best_iou > self.pos_iou_thr
            g = gtb[best]
            diag = jnp.sqrt(prop[:, 3] ** 2 + prop[:, 4] ** 2)
            tgt = jnp.concatenate([
                (g[:, :2] - prop[:, :2]) / diag[:, None],
                (g[:, 2:3] - prop[:, 2:3])
                / jnp.maximum(prop[:, 5:6], 1e-3),
                jnp.log(jnp.maximum(g[:, 3:6], 1e-3)
                        / jnp.maximum(prop[:, 3:6], 1e-3)),
                jnp.sin(g[:, 6:7] - prop[:, 6:7]),
            ], -1)
            pred = jnp.concatenate(
                [delta[:, :6], jnp.sin(delta[:, 6:7])], -1)
            npos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
            l_reg = jnp.sum(smooth_l1_loss(pred, tgt)
                            * pos[:, None]) / npos
            tgt_cls = jnp.clip(
                (best_iou - self.cls_neg_thr)
                / (self.cls_pos_thr - self.cls_neg_thr), 0, 1)
            l_cls = jnp.sum(binary_cross_entropy_with_logits(
                cls_logit, tgt_cls) * pmask) \
                / jnp.maximum(jnp.sum(pmask), 1.0)
            # keypoint fg supervision
            _, inside = points_in_boxes_local(kpx, gtb[:, :7])
            fg = jnp.any(inside & gtm[None], -1)
            l_kp = jnp.sum(binary_cross_entropy_with_logits(
                kpl, fg.astype(jnp.float32)) * kpm) \
                / jnp.maximum(jnp.sum(kpm), 1.0)
            return l_reg, l_cls, l_kp

        l_reg, l_cls, l_kp = jax.vmap(one)(
            out['_proposals'], out['_delta'], out['_cls_logit'],
            out['mask'], out['_kp_logit'], kp_xyz, kp_mask,
            gt_bboxes, gt_mask)
        return dict(loss_rcnn_reg=jnp.mean(l_reg),
                    loss_rcnn_cls=jnp.mean(l_cls),
                    loss_keypoint_seg=jnp.mean(l_kp))
