"""Part-A² second stage: point-wise part supervision + part-aggregation
RoI refinement.

Refs:
- mmdet3d/models/roi_heads/mask_heads/pointwise_semantic_head.py:15-180
  (foreground seg + intra-object part regression on UNet voxel features,
  targets from GT boxes: part label = normalized local coords)
- mmdet3d/models/roi_heads/part_aggregation_roi_head.py:1-379 +
  bbox_heads/parta2_bbox_head.py (RoIAware pooling of seg + part features
  at 14³, sparse-conv part aggregation, IoU-guided cls + canonical-frame
  box refinement)

TPU design: fixed R proposals; RoIAware pooling is a vectorized
(R×V) membership test + scatter into dense [R, G³, C] grids (avg for part
features, max for seg features — ref roi_extractor modes); the part
aggregation stage runs as dense 3D convs over the tiny G³ grids (pure MXU
work at this size) instead of sparse convs.
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
                             sigmoid_focal_loss, smooth_l1_loss)


def points_in_boxes_local(xyz, boxes):
    """xyz [P,3]; boxes [N,7] (bottom-center z) → local normalized coords
    [P,N,3] in [0,1] when inside, and inside mask [P,N]."""
    d = xyz[:, None, :] - boxes[None, :, :3]              # [P,N,3]
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    lx = d[..., 0] * c[None] - d[..., 1] * s[None]
    ly = d[..., 0] * s[None] + d[..., 1] * c[None]
    lz = d[..., 2]
    dims = boxes[None, :, 3:6]
    inside = ((jnp.abs(lx) < dims[..., 0] / 2)
              & (jnp.abs(ly) < dims[..., 1] / 2)
              & (lz >= 0) & (lz < dims[..., 2]))
    # normalized part coordinates (ref pointwise_semantic_head:116-128)
    part = jnp.stack([lx / jnp.maximum(dims[..., 0], 1e-4) + 0.5,
                      ly / jnp.maximum(dims[..., 1], 1e-4) + 0.5,
                      lz / jnp.maximum(dims[..., 2], 1e-4)], -1)
    return jnp.clip(part, 0, 1), inside


@MODELS.register_module()
class PointwiseSemanticHead(nn.Module):
    """Ref pointwise_semantic_head.py:15-180."""
    in_channels: int = 16
    extra_width: float = 0.2        # GT enlargement for the ignore band
    seg_score_thr: float = 0.3

    @nn.compact
    def __call__(self, seg_features):
        seg_logit = nn.Dense(1, name='seg_cls')(seg_features)[..., 0]
        part_reg = nn.Dense(3, name='seg_reg')(seg_features)
        return seg_logit, part_reg

    def targets(self, voxel_xyz, voxel_valid, gt_bboxes, gt_mask):
        """→ (fg [V], ignore [V], part_tgt [V,3]) for ONE sample."""
        gtb = gt_bboxes[:, :7]
        part, inside = points_in_boxes_local(voxel_xyz, gtb)
        inside = inside & gt_mask[None]
        enlarged = gtb.at[:, 3:6].add(2 * self.extra_width)
        _, inside_enl = points_in_boxes_local(voxel_xyz, enlarged)
        inside_enl = inside_enl & gt_mask[None]
        fg = jnp.any(inside, -1) & voxel_valid
        ignore = jnp.any(inside_enl, -1) & ~fg & voxel_valid
        first = jnp.argmax(inside, -1)
        part_tgt = jnp.take_along_axis(
            part, first[:, None, None], 1)[:, 0]
        return fg, ignore, part_tgt

    def loss(self, seg_logit, part_reg, voxel_xyz, voxel_valid,
             gt_bboxes, gt_mask):
        """Batched seg focal + part BCE loss (ref :130-180)."""
        def one(logit, preg, xyz, vv, gtb, gtm):
            fg, ignore, part_tgt = self.targets(xyz, vv, gtb, gtm)
            w = (vv & ~ignore).astype(jnp.float32)
            npos = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
            l_seg = jnp.sum(sigmoid_focal_loss(
                logit[:, None], fg[:, None].astype(jnp.float32))[:, 0]
                * w) / npos
            l_part = jnp.sum(binary_cross_entropy_with_logits(
                preg, part_tgt) * fg[:, None]) / npos / 3.0
            return l_seg, l_part

        l_seg, l_part = jax.vmap(one)(seg_logit, part_reg, voxel_xyz,
                                      voxel_valid, gt_bboxes, gt_mask)
        return dict(loss_semantic=jnp.mean(l_seg),
                    loss_part=jnp.mean(l_part))


def roi_candidate_select(xyz, valid, rois, num_candidates: int):
    """Per-RoI top-K nearest voxels by 3D distance to the box's geometric
    center — a capacity-bounded SUPERSET of the box members (any member
    lies within the half-diagonal; selection is exact `top_k`, so the
    pool below equals the all-pairs pool whenever the member count ≤ K —
    tested in tests/test_models/test_parta2_roi.py).

    Why: the all-pairs pool scatters V·R rows ([32000, 128] at KITTI
    train sizing = 8.2M rows ×2 pools — scatters are row-count-bound,
    ~16 ns/row); measured 1107 ms fwd+bwd on the v5e
    (tools/probe_parta2_parts.py). Pruning to R·K rows (128·1024) keeps
    only the distance GEMM at V·R and cuts the scatter 25×.

    → idx [R, K] int32 rows into xyz, cand_valid [R, K]."""
    ctr = rois[:, :3] + jnp.concatenate(
        [jnp.zeros_like(rois[:, :2]), rois[:, 5:6] / 2], -1)
    # GEMM-form pairwise distance (ranks only — exact under f32 here:
    # ties broken by index order either way)
    d2 = (jnp.sum(ctr ** 2, -1)[:, None]
          - 2.0 * ctr @ xyz.T + jnp.sum(xyz ** 2, -1)[None])   # [R, V]
    d2 = jnp.where(valid[None], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, num_candidates)              # [R, K]
    return idx, jnp.isfinite(neg)


def roi_aware_pool_pruned(xyz, feats, valid, rois, grid_size: int,
                          mode: str, idx, cand_valid):
    """roi_aware_pool on a per-RoI candidate subset (roi_candidate_select):
    identical output whenever every member is among the candidates."""
    G = grid_size
    R, K = idx.shape
    C = feats.shape[1]
    cxyz = jnp.take(xyz, idx.reshape(-1), axis=0).reshape(R, K, 3)
    cf = jnp.take(feats, idx.reshape(-1), axis=0).reshape(R, K, C)

    def one(box, pts):
        d = pts - box[None, :3]
        c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
        lx = d[:, 0] * c - d[:, 1] * s
        ly = d[:, 0] * s + d[:, 1] * c
        lz = d[:, 2]
        inside = ((jnp.abs(lx) < box[3] / 2) & (jnp.abs(ly) < box[4] / 2)
                  & (lz >= 0) & (lz < box[5]))
        part = jnp.stack([lx / jnp.maximum(box[3], 1e-4) + 0.5,
                          ly / jnp.maximum(box[4], 1e-4) + 0.5,
                          lz / jnp.maximum(box[5], 1e-4)], -1)
        return jnp.clip(part, 0, 1), inside

    part, inside = jax.vmap(one)(rois, cxyz)          # [R,K,3], [R,K]
    inside = inside & cand_valid
    cell = jnp.clip((part * G).astype(jnp.int32), 0, G - 1)
    flat = (cell[..., 0] * G * G + cell[..., 1] * G + cell[..., 2])
    full = jnp.arange(R)[:, None] * (G ** 3) + flat
    full = jnp.where(inside, full, R * G ** 3)
    if mode == 'max':
        out = jnp.full((R * G ** 3 + 1, C), -jnp.inf, feats.dtype)
        out = out.at[full.reshape(-1)].max(
            jnp.where(inside[..., None], cf,
                      -jnp.inf).reshape(-1, C), mode='drop')
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    else:
        acc = jnp.zeros((R * G ** 3 + 1, C), feats.dtype)
        acc = acc.at[full.reshape(-1)].add(
            jnp.where(inside[..., None], cf, 0.0).reshape(-1, C),
            mode='drop')
        cnt = jnp.zeros((R * G ** 3 + 1,), feats.dtype)
        cnt = cnt.at[full.reshape(-1)].add(
            inside.reshape(-1).astype(feats.dtype), mode='drop')
        out = acc / jnp.maximum(cnt[:, None], 1.0)
    return out[:R * G ** 3].reshape(R, G, G, G, C)


def roi_aware_pool(xyz, feats, valid, rois, grid_size: int,
                   mode: str = 'max'):
    """RoIAwarePool3d (ref mmcv ops/roiaware_pool3d): pool voxel features
    into per-RoI G³ grids. xyz [V,3]; feats [V,C]; rois [R,7] →
    [R, G, G, G, C]."""
    G = grid_size
    R = rois.shape[0]
    V, C = feats.shape
    part, inside = points_in_boxes_local(xyz, rois)        # [V,R,·]
    inside = inside & valid[:, None]
    cell = jnp.clip((part * G).astype(jnp.int32), 0, G - 1)  # [V,R,3]
    flat = (cell[..., 0] * G * G + cell[..., 1] * G + cell[..., 2])
    ridx = jnp.broadcast_to(jnp.arange(R)[None], (V, R))
    full = ridx * (G ** 3) + flat
    full = jnp.where(inside, full, R * G ** 3)
    fexp = jnp.broadcast_to(feats[:, None, :], (V, R, C))
    if mode == 'max':
        out = jnp.full((R * G ** 3 + 1, C), -jnp.inf, feats.dtype)
        out = out.at[full.reshape(-1)].max(
            jnp.where(inside[..., None], fexp,
                      -jnp.inf).reshape(-1, C), mode='drop')
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    else:
        acc = jnp.zeros((R * G ** 3 + 1, C), feats.dtype)
        acc = acc.at[full.reshape(-1)].add(
            jnp.where(inside[..., None], fexp, 0.0).reshape(-1, C),
            mode='drop')
        cnt = jnp.zeros((R * G ** 3 + 1,), feats.dtype)
        cnt = cnt.at[full.reshape(-1)].add(
            inside.reshape(-1).astype(feats.dtype), mode='drop')
        out = acc / jnp.maximum(cnt[:, None], 1.0)
    return out[:R * G ** 3].reshape(R, G, G, G, C)


class Conv3DBlock(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (3, 3, 3),
                    strides=(self.stride,) * 3, padding='SAME',
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        return nn.relu(x)


@MODELS.register_module()
class PartA2RoIHead(nn.Module):
    """Part-aggregation RoI head (ref part_aggregation_roi_head.py +
    parta2_bbox_head.py, dense-conv TPU variant)."""
    seg_channels: int = 16
    grid_size: int = 14
    conv_channels: Sequence[int] = (128, 128)
    fc_channels: Sequence[int] = (256, 256)
    voxel_size: Sequence[float] = (0.05, 0.05, 0.1)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    pos_iou_thr: float = 0.55
    cls_pos_thr: float = 0.75      # ref train_cfg cls_pos_thr
    cls_neg_thr: float = 0.25
    # optional reference RoI sampling (ref train_cfg sampler
    # IoUNegPiecewiseSampler): restrict the RCNN loss to `num` sampled
    # RoIs with piecewise negative quotas; off → all proposals weighted
    # (the round-1..3 behavior)
    with_roi_sampler: bool = False
    roi_sampler: Any = None        # dict(num=..., pos_fraction=..., ...)
    # candidate capacity per RoI for the pruned pool (0 → all-pairs
    # exact pool). Equal outputs whenever every box holds ≤ K voxels
    # (top-K-nearest superset, roi_candidate_select); 25× fewer scatter
    # rows at KITTI train sizing.
    roi_candidates: int = 0

    @nn.compact
    def __call__(self, unet_out, proposals, train: bool = False):
        """unet_out: dict from SparseUNet (+ seg head outputs added by the
        detector: 'seg_logit' [B?...]) — here per-batch lists flattened:
        seg_features [V, C] with coords carrying the batch index."""
        boxes = proposals['bboxes'][..., :7]
        B, R = boxes.shape[:2]
        G = self.grid_size
        coords = unet_out['seg_coords']
        vsz = jnp.asarray(self.voxel_size)
        origin = jnp.asarray(self.point_cloud_range[:3])
        # voxel centers (z, y, x) coords → world xyz
        xyz = jnp.stack([
            coords[:, 3].astype(jnp.float32) * vsz[0] + vsz[0] / 2
            + origin[0],
            coords[:, 2].astype(jnp.float32) * vsz[1] + vsz[1] / 2
            + origin[1],
            coords[:, 1].astype(jnp.float32) * vsz[2] + vsz[2] / 2
            + origin[2]], -1)
        seg_feats = unet_out['seg_features']
        part_feats = jnp.concatenate(
            [jax.nn.sigmoid(unet_out['seg_logit'])[:, None],
             jax.nn.sigmoid(unet_out['part_reg'])], -1)     # [V, 4]
        valid_all = unet_out['seg_valid']
        bidx = coords[:, 0]

        def pool_one(b, rois):
            vv = valid_all & (bidx == b)
            if self.roi_candidates > 0:
                idx, cv = roi_candidate_select(xyz, vv, rois,
                                               self.roi_candidates)
                pooled_seg = roi_aware_pool_pruned(
                    xyz, seg_feats, vv, rois, G, 'max', idx, cv)
                pooled_part = roi_aware_pool_pruned(
                    xyz, part_feats, vv, rois, G, 'avg', idx, cv)
            else:
                pooled_seg = roi_aware_pool(xyz, seg_feats, vv, rois, G,
                                            'max')
                pooled_part = roi_aware_pool(xyz, part_feats, vv, rois,
                                             G, 'avg')
            return jnp.concatenate([pooled_part, pooled_seg], -1)

        pooled = jax.vmap(pool_one)(jnp.arange(B), boxes)  # [B,R,G,G,G,C]
        x = pooled.reshape(B * R, G, G, G, -1)
        # part aggregation: strided dense 3D convs 14³ → 7³ → 4³
        for i, ch in enumerate(self.conv_channels):
            x = Conv3DBlock(ch, stride=2, name=f'conv{i}')(x, train)
        x = x.reshape(B, R, -1)
        for i, ch in enumerate(self.fc_channels):
            x = nn.Dense(ch, name=f'fc{i}')(x)
            x = nn.relu(x)
        cls_logit = nn.Dense(1, name='cls')(x)[..., 0]     # IoU-guided
        delta = nn.Dense(7, name='reg')(x)

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
        score = jax.nn.sigmoid(cls_logit) * proposals['scores']
        return dict(bboxes=refined, scores=score,
                    labels=proposals['labels'], mask=proposals['mask'],
                    _delta=delta, _cls_logit=cls_logit, _proposals=boxes)

    def loss(self, out, gt_bboxes, gt_labels, gt_mask):
        """IoU-guided cls (interpolated 0.25→0.75 soft target, ref
        parta2_bbox_head get_targets) + canonical reg on iou>0.55."""
        def one(b, prop, delta, cls_logit, pmask, gtb, gtm):
            iou = nearest_iou_bev(prop, gtb[:, :7])
            iou = jnp.where(gtm[None] & pmask[:, None], iou, -1.0)
            best = jnp.argmax(iou, -1)
            best_iou = jnp.max(iou, -1)
            pos = best_iou > self.pos_iou_thr
            # optional reference-style RoI sampling: loss restricted to
            # the sampled subset via a weight mask (fixed shapes)
            if self.with_roi_sampler:
                from ..task_modules import IoUNegPiecewiseSampler
                sampler = IoUNegPiecewiseSampler(
                    **dict(self.roi_sampler or {}))
                # per-step pseudo-randomness derived from the logits (no
                # rng is threaded through the loss path; logits change
                # every step, so the sampled subset does too)
                seed = jax.lax.bitcast_convert_type(
                    jnp.sum(cls_logit), jnp.int32)
                key = jax.random.fold_in(jax.random.PRNGKey(0),
                                         seed + b)
                idx, _, valid_s = sampler.sample(
                    key, jnp.clip(best_iou, 0.0, 1.0))
                w = jnp.zeros(prop.shape[0], jnp.float32).at[idx].add(
                    valid_s.astype(jnp.float32))
                w = jnp.minimum(w, 1.0) * pmask
                pos = pos & (w > 0)
                pmask = w > 0
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
            # interpolated cls target (ref: (iou - neg)/(pos - neg))
            tgt_cls = jnp.clip(
                (best_iou - self.cls_neg_thr)
                / (self.cls_pos_thr - self.cls_neg_thr), 0, 1)
            l_cls = jnp.sum(binary_cross_entropy_with_logits(
                cls_logit, tgt_cls) * pmask) \
                / jnp.maximum(jnp.sum(pmask), 1.0)
            return l_reg, l_cls

        B = out['_proposals'].shape[0]
        l_reg, l_cls = jax.vmap(one)(
            jnp.arange(B), out['_proposals'], out['_delta'],
            out['_cls_logit'], out['mask'], gt_bboxes, gt_mask)
        return dict(loss_rcnn_reg=jnp.mean(l_reg),
                    loss_rcnn_cls=jnp.mean(l_cls))
