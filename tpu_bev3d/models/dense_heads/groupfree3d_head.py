"""Group-Free 3D detection head.

Ref: mmdet3d/models/dense_heads/groupfree3d_head.py:1-1108 — no voting:
initial object candidates are sampled from the seed points by a learned
per-seed objectness (KPS), then a stack of transformer decoder layers
(GroupFree3DMHA: self-attention among candidates + cross-attention to ALL
seed features, learned positional embeddings from the evolving candidate
positions) refines them; every stage has its own prediction branch and
loss; inference averages the per-stage decodes.

TPU design: fixed K candidates; the decoder reuses the TransFusion
DecoderLayer (same post-norm/value-carries-pos semantics) with 3D
positional encodings.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.nms import aligned_3d_nms_mask
from ...registry import MODELS
from ..layers.pointnet_modules import SharedMLP
from ..losses.losses import (sigmoid_focal_loss, smooth_l1_loss,
                             softmax_cross_entropy)
from .transfusion_head import DecoderLayer


@MODELS.register_module()
class GroupFree3DHead(nn.Module):
    num_classes: int = 18
    in_channels: int = 288
    hidden_channel: int = 128
    num_proposals: int = 256
    num_decoder_layers: int = 6
    num_heads: int = 8
    ffn_channel: int = 256
    mean_sizes: Any = None
    num_dir_bins: int = 12
    # test
    nms_iou_thr: float = 0.25
    score_thr: float = 0.05
    max_num: int = 64

    def _mean_sizes(self):
        if self.mean_sizes is not None:
            return np.asarray(self.mean_sizes, np.float32)
        return np.ones((self.num_classes, 3), np.float32)

    def _pred_branch(self, x, mask, name, train):
        """Per-stage prediction head (ref prediction_heads)."""
        K, D = self.num_classes, self.num_dir_bins
        h = SharedMLP((self.hidden_channel,), name=f'{name}_mlp')(
            x, mask, train)
        out_dim = 1 + 3 + D * 2 + K * 3 + K
        p = nn.Dense(out_dim, name=f'{name}_out')(h)
        i = 0
        obj = p[..., i]; i += 1
        d_center = p[..., i:i + 3]; i += 3
        dir_cls = p[..., i:i + D]; i += D
        dir_res = p[..., i:i + D]; i += D
        size_res = p[..., i:i + K * 3].reshape(
            p.shape[:-1] + (K, 3)); i += K * 3
        sem = p[..., i:]
        return dict(obj=obj, d_center=d_center, dir_cls=dir_cls,
                    dir_res=dir_res, size_res=size_res, sem=sem)

    @nn.compact
    def __call__(self, feat_dict, train: bool = False):
        seed_xyz = feat_dict['fp_xyz']
        seed_feat = feat_dict['fp_features']
        seed_mask = feat_dict['fp_mask']
        B, S, C = seed_feat.shape
        feat = nn.Dense(self.hidden_channel, name='in_proj')(seed_feat)
        # KPS: learned per-seed objectness → top-K candidates (ref
        # 'initial candidates sampling' points_obj_cls)
        sample_logit = nn.Dense(1, name='points_obj_cls')(feat)[..., 0]
        score = jnp.where(seed_mask, jax.nn.sigmoid(sample_logit), -1.0)
        _, top = jax.lax.top_k(score, self.num_proposals)
        cand_xyz = jnp.take_along_axis(seed_xyz, top[..., None], 1)
        q = jnp.take_along_axis(feat, top[..., None], 1)
        cand_mask = jnp.take_along_axis(seed_mask, top, 1)

        stages = []
        center = cand_xyz
        for li in range(self.num_decoder_layers):
            q = DecoderLayer(self.hidden_channel, self.num_heads,
                             self.ffn_channel,
                             name=f'decoder{li}')(
                q, feat, center, seed_xyz, train=train)
            pred = self._pred_branch(q, cand_mask, f'stage{li}', train)
            center = cand_xyz + pred['d_center']
            pred['center'] = center
            stages.append(pred)
        return dict(stages=stages, sample_logit=sample_logit,
                    seed_xyz=seed_xyz, seed_mask=seed_mask,
                    cand_mask=cand_mask)

    # --------------------------------------------------------------- loss

    def loss_by_feat(self, res, gt_bboxes, gt_labels, gt_mask):
        mean_sizes = jnp.asarray(self._mean_sizes())
        D = self.num_dir_bins
        bin_w = 2 * np.pi / D

        def stage_loss(pred, cand_mask, gtb, gtl, gtm):
            gt_ctr = gtb[:, :3] + gtb[:, 3:6] * jnp.asarray([0, 0, 0.5])
            d = jnp.linalg.norm(pred['center'][:, None] - gt_ctr[None],
                                axis=-1)
            d = jnp.where(gtm[None], d, 1e6)
            nearest = jnp.argmin(d, -1)
            dmin = jnp.min(d, -1)
            pos = (dmin < 0.3) & cand_mask
            neg = (dmin > 0.6) & cand_mask
            npos = jnp.maximum(jnp.sum(pos), 1.0)
            l_obj = jnp.sum(sigmoid_focal_loss(
                pred['obj'][:, None],
                pos[:, None].astype(jnp.float32))[:, 0]
                * (pos | neg)) / jnp.maximum(jnp.sum(pos | neg), 1.0)
            l_center = jnp.sum(jnp.sum(smooth_l1_loss(
                pred['center'], gt_ctr[nearest]), -1) * pos) / npos
            yaw = gtb[:, 6] % (2 * np.pi)
            bin_id = jnp.floor(yaw / bin_w).astype(jnp.int32) % D
            bin_res = yaw - (bin_id * bin_w + bin_w / 2)
            l_dir = jnp.sum(softmax_cross_entropy(
                pred['dir_cls'], bin_id[nearest]) * pos) / npos
            rp = jnp.take_along_axis(
                pred['dir_res'], bin_id[nearest][:, None], -1)[..., 0]
            l_dir_res = jnp.sum(smooth_l1_loss(
                rp, bin_res[nearest] / (bin_w / 2)) * pos) / npos
            cls = jnp.clip(gtl[nearest], 0)
            # class-axis gather (see vote_head note on OOB NaN fill)
            sz = jnp.take_along_axis(
                pred['size_res'], cls[:, None, None], 1)[:, 0]
            sz_tgt = (gtb[nearest][:, 3:6] - mean_sizes[cls]) \
                / jnp.maximum(mean_sizes[cls], 1e-3)
            l_size = jnp.sum(jnp.sum(smooth_l1_loss(sz, sz_tgt), -1)
                             * pos) / npos
            l_sem = jnp.sum(softmax_cross_entropy(pred['sem'], cls)
                            * pos) / npos
            return (l_obj + l_center + l_dir + l_dir_res + l_size + l_sem)

        def one(r_stages, sample_logit, seed_xyz, seed_mask, cand_mask,
                gtb, gtl, gtm):
            # sampling loss: seeds inside a GT box are positives (ref KPS
            # points_obj_cls supervision)
            from ..roi_heads.part_aggregation_roi_head import \
                points_in_boxes_local
            _, inside = points_in_boxes_local(seed_xyz, gtb[:, :7])
            fg = jnp.any(inside & gtm[None], -1) & seed_mask
            l_sample = jnp.sum(sigmoid_focal_loss(
                sample_logit[:, None],
                fg[:, None].astype(jnp.float32))[:, 0] * seed_mask) \
                / jnp.maximum(jnp.sum(fg), 1.0)
            total = l_sample
            for pred in r_stages:
                total = total + stage_loss(pred, cand_mask, gtb, gtl, gtm)
            return total, l_sample

        stages_batched = res['stages']
        total, l_sample = jax.vmap(one)(
            stages_batched, res['sample_logit'], res['seed_xyz'],
            res['seed_mask'], res['cand_mask'], gt_bboxes, gt_labels,
            gt_mask)
        return dict(loss_total=jnp.mean(total),
                    loss_sampling=jnp.mean(l_sample))

    # ------------------------------------------------------------ predict

    def predict_by_feat(self, res):
        """Average the per-stage decodes (ref multi-stage ensemble)."""
        mean_sizes = jnp.asarray(self._mean_sizes())
        D = self.num_dir_bins
        bin_w = 2 * np.pi / D

        def decode_stage(pred):
            obj = jax.nn.sigmoid(pred['obj'])
            sem_p = jax.nn.softmax(pred['sem'], -1)
            sem_cls = jnp.argmax(sem_p, -1)
            scores = obj * jnp.max(sem_p, -1)
            bin_id = jnp.argmax(pred['dir_cls'], -1)
            dres = jnp.take_along_axis(pred['dir_res'], bin_id[..., None],
                                       -1)[..., 0] * (bin_w / 2)
            yaw = bin_id * bin_w + bin_w / 2 + dres
            sz = jnp.take_along_axis(
                pred['size_res'],
                sem_cls[..., None, None].repeat(3, -1), -2)[..., 0, :]
            dims = jnp.maximum(mean_sizes[sem_cls] * (1 + sz), 0.01)
            return pred['center'], dims, yaw, scores, sem_cls

        def one(r_stages, cand_mask):
            ctrs, dims_, yaws, scores_, cls_ = [], [], [], [], []
            for pred in r_stages:
                c, dm, yw, sc, cl = decode_stage(pred)
                ctrs.append(c); dims_.append(dm); yaws.append(yw)
                scores_.append(sc); cls_.append(cl)
            ctr = jnp.mean(jnp.stack(ctrs), 0)
            dims = jnp.mean(jnp.stack(dims_), 0)
            yaw = yaws[-1]
            scores = jnp.mean(jnp.stack(scores_), 0)
            sem_cls = cls_[-1]
            boxes = jnp.concatenate(
                [ctr - dims * jnp.asarray([0, 0, 0.5]), dims,
                 yaw[:, None]], -1)
            aab = jnp.concatenate([ctr - dims / 2, ctr + dims / 2], -1)
            valid = cand_mask & (scores > self.score_thr)
            keep = aligned_3d_nms_mask(aab, scores, sem_cls, valid,
                                       self.nms_iou_thr)
            top, idx = jax.lax.top_k(
                jnp.where(keep, scores, -1.0), self.max_num)
            return dict(bboxes=boxes[idx], scores=jnp.maximum(top, 0.0),
                        labels=sem_cls[idx], mask=top > 0)

        return jax.vmap(one)(res['stages'], res['cand_mask'])
