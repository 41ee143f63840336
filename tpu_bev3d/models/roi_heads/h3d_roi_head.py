"""H3DNet: geometric primitive heads + primitive-matching refinement.

Refs: mmdet3d/models/roi_heads/mask_heads/primitive_head.py:20-500
(per-type primitive votes: z-faces / xy-faces / edge lines, with
existence flags and center regression), roi_heads/h3d_roi_head.py +
bbox_heads/h3d_bbox_head.py (proposal refinement by matching predicted
primitives against each proposal's own primitive locations) and
detectors/h3dnet.py.

TPU design: fixed primitive counts (= seed count); matching is a
fixed-shape nearest-primitive gather per proposal primitive location.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS
from ..layers.pointnet_modules import SharedMLP
from ..losses.losses import (binary_cross_entropy_with_logits,
                             smooth_l1_loss)


def box_primitives(boxes):
    """GT boxes [G,7] → dict of primitive centers:
    z-faces [G,2,3] (top/bottom), xy-faces [G,4,3] (sides),
    lines [G,12,3] (edge midpoints)."""
    ctr = boxes[:, :3] + boxes[:, 3:6] * jnp.asarray([0, 0, 0.5])
    dx, dy, dz = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])

    def rot(lx, ly):
        return jnp.stack([lx * c - ly * s, lx * s + ly * c], -1)

    zero = jnp.zeros_like(dx)
    half = 0.5
    zf = jnp.stack([  # top, bottom
        jnp.concatenate([rot(zero, zero), (dz * half)[:, None]], -1),
        jnp.concatenate([rot(zero, zero), (-dz * half)[:, None]], -1),
    ], 1)
    xyf = jnp.stack([
        jnp.concatenate([rot(dx * half, zero), zero[:, None]], -1),
        jnp.concatenate([rot(-dx * half, zero), zero[:, None]], -1),
        jnp.concatenate([rot(zero, dy * half), zero[:, None]], -1),
        jnp.concatenate([rot(zero, -dy * half), zero[:, None]], -1),
    ], 1)
    lines = []
    for sx in (-half, half):
        for sy in (-half, half):
            lines.append(jnp.concatenate(
                [rot(dx * sx, dy * sy), zero[:, None]], -1))
    for sx in (-half, half):
        for sz in (-half, half):
            lines.append(jnp.concatenate(
                [rot(dx * sx, zero), (dz * sz)[:, None]], -1))
    for sy in (-half, half):
        for sz in (-half, half):
            lines.append(jnp.concatenate(
                [rot(zero, dy * sy), (dz * sz)[:, None]], -1))
    ln = jnp.stack(lines, 1)
    return {'z': zf + ctr[:, None], 'xy': xyf + ctr[:, None],
            'line': ln + ctr[:, None]}


@MODELS.register_module()
class PrimitiveHead(nn.Module):
    """One primitive type ('z' | 'xy' | 'line'), ref primitive_head.py."""
    primitive_type: str = 'z'
    in_channels: int = 256
    mlp_channels: Sequence[int] = (128, 128)
    near_thr: float = 0.3

    @nn.compact
    def __call__(self, feat_dict, train: bool = False):
        x = feat_dict['fp_features']
        mask = feat_dict['fp_mask']
        h = SharedMLP(tuple(self.mlp_channels), name='mlp')(x, mask, train)
        flag = nn.Dense(1, name='flag')(h)[..., 0]
        offset = nn.Dense(3, name='center')(h)
        center = feat_dict['fp_xyz'] + offset
        return dict(flag=flag, center=center, mask=mask,
                    seed_xyz=feat_dict['fp_xyz'])

    def loss(self, out, gt_bboxes, gt_mask):
        def one(flag, center, pmask, seed_xyz, gtb, gtm):
            prim = box_primitives(gtb[:, :7])[self.primitive_type]
            prim = prim.reshape(-1, 3)
            pvalid = jnp.repeat(gtm, prim.shape[0] // gtm.shape[0])
            d = jnp.linalg.norm(seed_xyz[:, None] - prim[None], axis=-1)
            d = jnp.where(pvalid[None], d, 1e6)
            nearest = jnp.argmin(d, -1)
            near = (jnp.min(d, -1) < self.near_thr) & pmask
            l_flag = jnp.sum(binary_cross_entropy_with_logits(
                flag, near.astype(jnp.float32)) * pmask) \
                / jnp.maximum(jnp.sum(pmask), 1.0)
            tgt = prim[nearest]
            l_center = jnp.sum(jnp.sum(smooth_l1_loss(center, tgt), -1)
                               * near) / jnp.maximum(jnp.sum(near), 1.0)
            return l_flag, l_center

        l_flag, l_center = jax.vmap(one)(
            out['flag'], out['center'], out['mask'], out['seed_xyz'],
            gt_bboxes, gt_mask)
        t = self.primitive_type
        return {f'loss_flag_{t}': jnp.mean(l_flag),
                f'loss_center_{t}': jnp.mean(l_center)}


@MODELS.register_module()
class H3DRoIHead(nn.Module):
    """Primitive-matching proposal refinement (ref h3d_bbox_head.py):
    each proposal's own primitive locations gather the distance to the
    nearest PREDICTED primitive of the same type; an MLP turns the
    agreement features into a score adjustment + center residual."""
    mlp_channels: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, proposals, prim_outs, train: bool = False):
        boxes = proposals['bboxes'][..., :7]
        B, N = boxes.shape[:2]

        def one(bx, prim_z, prim_xy, prim_ln, fz, fxy, fln):
            feats = []
            prim = box_primitives(bx)
            for key, pred_c, pred_f in (('z', prim_z, fz),
                                        ('xy', prim_xy, fxy),
                                        ('line', prim_ln, fln)):
                own = prim[key]                       # [N, P, 3]
                w = jax.nn.sigmoid(pred_f)[None, None]  # [1,1,S]
                d = jnp.linalg.norm(
                    own[:, :, None] - pred_c[None, None], axis=-1)
                d = d + (1 - w) * 10.0                # downweight absent
                dmin = jnp.min(d, -1)                 # [N, P]
                feats.append(dmin)
            return jnp.concatenate(feats, -1)         # [N, 2+4+12]

        agree = jax.vmap(one)(
            boxes, prim_outs['z']['center'], prim_outs['xy']['center'],
            prim_outs['line']['center'], prim_outs['z']['flag'],
            prim_outs['xy']['flag'], prim_outs['line']['flag'])
        h = agree
        for i, ch in enumerate(self.mlp_channels):
            h = nn.Dense(ch, name=f'fc{i}')(h)
            h = nn.relu(h)
        dscore = nn.Dense(1, name='score')(h)[..., 0]
        dctr = nn.Dense(3, name='refine')(h)
        refined = boxes.at[..., :3].add(dctr)
        scores = proposals['scores'] * jax.nn.sigmoid(dscore)
        out = dict(proposals)
        out['bboxes'] = jnp.concatenate(
            [refined, proposals['bboxes'][..., 7:]], -1) \
            if proposals['bboxes'].shape[-1] > 7 else refined
        out['scores'] = scores
        out['_dscore'] = dscore
        out['_refined'] = refined
        return out

    def loss(self, out, gt_bboxes, gt_mask):
        def one(bx, ds, pmask, gtb, gtm):
            gt_ctr = gtb[:, :3] + gtb[:, 3:6] * jnp.asarray([0, 0, 0.5])
            ctr = bx[:, :3] + bx[:, 3:6] * jnp.asarray([0, 0, 0.5])
            d = jnp.linalg.norm(ctr[:, None] - gt_ctr[None], axis=-1)
            d = jnp.where(gtm[None], d, 1e6)
            dmin = jnp.min(d, -1)
            pos = (dmin < 0.3) & pmask
            l_score = jnp.sum(binary_cross_entropy_with_logits(
                ds, pos.astype(jnp.float32)) * pmask) \
                / jnp.maximum(jnp.sum(pmask), 1.0)
            nearest = jnp.argmin(d, -1)
            l_ref = jnp.sum(jnp.sum(smooth_l1_loss(
                ctr, gt_ctr[nearest]), -1) * pos) \
                / jnp.maximum(jnp.sum(pos), 1.0)
            return l_score, l_ref

        l_score, l_ref = jax.vmap(one)(
            out['_refined'], out['_dscore'], out['mask'], gt_bboxes,
            gt_mask)
        return dict(loss_h3d_score=jnp.mean(l_score),
                    loss_h3d_refine=jnp.mean(l_ref))
