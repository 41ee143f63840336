"""Second-stage RoI refinement over BEV features.

TPU-native counterpart of the reference's roi_heads subsystem
(ref: mmdet3d/models/roi_heads/ — PartA2 part-aggregation and PV-RCNN
keypoint SA refinement, part_aggregation_roi_head.py / pv_rcnn_roi_head.py).
Those pool point/voxel features inside each proposal with sparse convs /
PointNet SA; here each rotated proposal samples a G×G grid of BEV points,
bilinearly gathers the (already voxel-aggregated) BEV features, and an MLP
regresses a box residual + IoU-aware score — the same
propose-pool-refine contract with all gathers vectorized and fixed-shape.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS
from ...ops.iou3d import nearest_iou_bev
from ..losses.losses import (binary_cross_entropy_with_logits,
                             smooth_l1_loss)


def bilinear_sample_bev(feat, xy, pc_range, out_shape):
    """feat [H, W, C] BEV map (y=rows, x=cols); xy [..., 2] in meters →
    [..., C]."""
    H, W, C = feat.shape
    x0, y0 = pc_range[0], pc_range[1]
    x1, y1 = pc_range[3], pc_range[4]
    u = (xy[..., 0] - x0) / (x1 - x0) * (W - 1)
    v = (xy[..., 1] - y0) / (y1 - y0) * (H - 1)
    u = jnp.clip(u, 0, W - 1 - 1e-4)
    v = jnp.clip(v, 0, H - 1 - 1e-4)
    iu, iv = jnp.floor(u).astype(jnp.int32), jnp.floor(v).astype(jnp.int32)
    du, dv = u - iu, v - iv
    f00 = feat[iv, iu]
    f01 = feat[iv, iu + 1]
    f10 = feat[iv + 1, iu]
    f11 = feat[iv + 1, iu + 1]
    return (f00 * ((1 - dv) * (1 - du))[..., None]
            + f01 * ((1 - dv) * du)[..., None]
            + f10 * (dv * (1 - du))[..., None]
            + f11 * (dv * du)[..., None])


@MODELS.register_module()
class BEVGridRoIHead(nn.Module):
    in_channels: int = 512
    grid_size: int = 6
    mlp_channels: Sequence[int] = (256, 256)
    point_cloud_range: Sequence[float] = (-54., -54., -5., 54., 54., 3.)
    pos_iou_thr: float = 0.55
    code_weights: Sequence[float] = (1., 1., 1., 1., 1., 1., 1.)

    def _grid_points(self, boxes):
        """[N, 7] → [N, G², 2] BEV sample points inside each rotated box."""
        G = self.grid_size
        lin = (np.arange(G, dtype=np.float32) + 0.5) / G - 0.5
        gx, gy = np.meshgrid(lin, lin, indexing='ij')
        local = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1))
        local = local[None] * boxes[:, None, 3:5]
        c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
        x = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
        y = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
        return jnp.stack([x, y], -1) + boxes[:, None, :2]

    @nn.compact
    def __call__(self, bev_feat, proposals, train: bool = False):
        """bev_feat [B, H, W, C]; proposals dict(bboxes [B,N,7+], scores,
        labels, mask) → refined dict + raw deltas for the loss."""
        boxes = proposals['bboxes'][..., :7]
        B, N = boxes.shape[:2]
        G2 = self.grid_size ** 2

        def one(feat, bx):
            pts = self._grid_points(bx)                   # [N, G², 2]
            return bilinear_sample_bev(feat, pts,
                                       self.point_cloud_range, None)

        pooled = jax.vmap(one)(bev_feat, boxes)           # [B,N,G²,C]
        x = pooled.reshape(B, N, -1)
        for i, ch in enumerate(self.mlp_channels):
            x = nn.Dense(ch, name=f'fc{i}')(x)
            x = nn.LayerNorm(name=f'ln{i}')(x)
            x = nn.relu(x)
        delta = nn.Dense(7, name='reg')(x)                # box residual
        iou_logit = nn.Dense(1, name='iou')(x)[..., 0]

        diag = jnp.sqrt(boxes[..., 3] ** 2 + boxes[..., 4] ** 2)
        refined = jnp.concatenate([
            boxes[..., :2] + delta[..., :2] * diag[..., None],
            boxes[..., 2:3] + delta[..., 2:3] * boxes[..., 5:6],
            boxes[..., 3:6] * jnp.exp(jnp.clip(delta[..., 3:6], -2, 2)),
            boxes[..., 6:7] + delta[..., 6:7],
        ], -1)
        if proposals['bboxes'].shape[-1] > 7:
            refined = jnp.concatenate(
                [refined, proposals['bboxes'][..., 7:]], -1)
        score = jax.nn.sigmoid(iou_logit) * proposals['scores']
        return dict(bboxes=refined, scores=score,
                    labels=proposals['labels'], mask=proposals['mask'],
                    _delta=delta, _iou_logit=iou_logit,
                    _proposals=boxes)

    # ----------------------------------------------------------------- loss

    def loss(self, out, gt_bboxes, gt_labels, gt_mask):
        """IoU-matched refinement loss (ref part_aggregation_roi_head
        corner/residual losses, simplified to residual smooth-l1 + IoU BCE).
        """
        def one(prop, delta, iou_logit, pmask, gtb, gtm):
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
            cw = jnp.asarray(self.code_weights)
            npos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
            l_reg = jnp.sum(smooth_l1_loss(pred, tgt) * cw
                            * pos[:, None]) / npos
            # IoU-aware score target (clipped linear mapping, PV-RCNN style)
            tgt_iou = jnp.clip((best_iou - 0.25) / 0.5, 0, 1)
            l_iou = jnp.sum(binary_cross_entropy_with_logits(
                iou_logit, tgt_iou) * pmask) \
                / jnp.maximum(jnp.sum(pmask), 1.0)
            return l_reg, l_iou

        l_reg, l_iou = jax.vmap(one)(
            out['_proposals'], out['_delta'], out['_iou_logit'],
            out['mask'], gt_bboxes, gt_mask)
        return dict(loss_rcnn_reg=jnp.mean(l_reg),
                    loss_rcnn_iou=jnp.mean(l_iou))
