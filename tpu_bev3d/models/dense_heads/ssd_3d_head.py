"""3DSSD head — candidate generation + anchor-free single-stage box head.

Ref: mmdet3d/models/dense_heads/ssd_3d_head.py:21-560 (SSD3DHead on the
VoteHead skeleton): a range-clipped candidate shift on the F-FPS seeds
(vote module with with_res_feat=False), SA aggregation around candidates,
then anchor-free prediction — centerness-weighted classification
(targets = geometric centerness of the candidate inside its GT, ref
get_targets_single:324-456), direct size regression
(AnchorFreeBBoxCoder), heading bin+residual, corner loss and candidate
(vote) loss.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.nms import box3d_multiclass_nms
from ...registry import MODELS
from ..layers.pointnet_modules import SharedMLP
from ..losses.losses import (sigmoid_focal_loss, smooth_l1_loss,
                             softmax_cross_entropy)
from ..roi_heads.part_aggregation_roi_head import points_in_boxes_local


def box_corners_3d(boxes):
    """[N,7] (bottom-center) → [N,8,3] corners."""
    dims = boxes[:, 3:6]
    template = jnp.asarray(
        [[1, 1, 0], [1, -1, 0], [-1, -1, 0], [-1, 1, 0],
         [1, 1, 2], [1, -1, 2], [-1, -1, 2], [-1, 1, 2]],
        jnp.float32) * 0.5
    local = template[None] * dims[:, None]
    c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    x = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    y = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    return jnp.stack([x, y, local[..., 2]], -1) + boxes[:, None, :3]


@MODELS.register_module()
class SSD3DHead(nn.Module):
    num_classes: int = 1
    in_channels: int = 256
    num_candidates: int = 256
    vote_xyz_range: Sequence[float] = (3.0, 3.0, 2.0)
    # candidate aggregation (ref vote_aggregation_cfg: MSG radii)
    agg_radii: Sequence[float] = (4.8, 6.4)
    agg_samples: Sequence[int] = (16, 32)
    agg_channels: Sequence[Sequence[int]] = ((64, 64, 128), (64, 64, 128))
    pred_channels: Sequence[int] = (128,)
    num_dir_bins: int = 12
    # test
    score_thr: float = 0.1
    nms_iou_thr: float = 0.1
    max_num: int = 64

    @nn.compact
    def __call__(self, feat_dict, train: bool = False):
        seed_xyz = feat_dict['fp_xyz']
        seed_feat = feat_dict['fp_features']
        seed_mask = feat_dict['fp_mask']
        B, S, C = seed_feat.shape
        n_cand = min(self.num_candidates, S)
        cand_seed_xyz = seed_xyz[:, :n_cand]
        cand_feat_in = seed_feat[:, :n_cand]
        cand_mask = seed_mask[:, :n_cand]

        # candidate shift (ref VoteModule with_res_feat=False + clipping)
        h = SharedMLP((C,), name='vote_mlp')(cand_feat_in, cand_mask, train)
        offset = nn.Dense(3, name='vote_out')(h)
        limit = jnp.asarray(self.vote_xyz_range)
        offset = jnp.clip(offset, -limit, limit)
        cand_xyz = cand_seed_xyz + offset

        # aggregation: MSG grouping of ALL seeds around the candidates
        from ..middle_encoders.voxel_set_abstraction import _TargetSAMSG
        sa = nn.vmap(
            _TargetSAMSG, in_axes=(0, 0, 0, 0, None), out_axes=0,
            variable_axes={'params': None, 'batch_stats': None},
            split_rngs={'params': False}, methods=['__call__'])(
                tuple(self.agg_radii), tuple(self.agg_samples),
                tuple(tuple(c) for c in self.agg_channels),
                name='cand_sa')
        feat = sa(cand_xyz, seed_xyz, seed_feat, seed_mask, False)

        h = SharedMLP(tuple(self.pred_channels), name='pred_mlp')(
            feat, cand_mask, train)
        K, D = self.num_classes, self.num_dir_bins
        out = nn.Dense(K + 3 + 3 + 2 * D, name='pred_out')(h)
        i = 0
        cls_logit = out[..., :K]; i += K
        center = cand_xyz + out[..., i:i + 3]; i += 3
        dims = out[..., i:i + 3]; i += 3
        dir_cls = out[..., i:i + D]; i += D
        dir_res = out[..., i:i + D]
        return dict(seed_xyz=cand_seed_xyz, cand_xyz=cand_xyz,
                    cand_mask=cand_mask, cls_logit=cls_logit,
                    center=center, dims=dims, dir_cls=dir_cls,
                    dir_res=dir_res)

    # --------------------------------------------------------------- loss

    def loss_by_feat(self, res, gt_bboxes, gt_labels, gt_mask):
        D = self.num_dir_bins
        bin_w = 2 * np.pi / D

        def one(r, gtb, gtl, gtm):
            cx = r['cand_xyz']
            part, inside = points_in_boxes_local(cx, gtb[:, :7])
            inside = inside & gtm[None]
            pos = jnp.any(inside, -1) & r['cand_mask']
            gi = jnp.argmax(inside, -1)
            g = gtb[gi]
            # centerness target (ref :404-433): per-axis closeness product
            p = jnp.take_along_axis(part, gi[:, None, None], 1)[:, 0]
            cent = (jnp.prod(jnp.clip(
                1 - jnp.abs(p - 0.5) * 2, 1e-3, 1), -1)) ** (1 / 3)
            onehot = jax.nn.one_hot(jnp.clip(gtl[gi], 0), self.num_classes)
            tgt_cls = onehot * jnp.where(pos, cent, 0.0)[:, None]
            w = r['cand_mask'].astype(jnp.float32)
            npos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
            l_cls = jnp.sum(
                sigmoid_focal_loss(r['cls_logit'], tgt_cls)
                * w[:, None]) / npos
            gt_ctr = g[:, :3] + g[:, 3:6] * jnp.asarray([0, 0, 0.5])
            l_center = jnp.sum(jnp.sum(
                smooth_l1_loss(r['center'], gt_ctr), -1) * pos) / npos
            l_size = jnp.sum(jnp.sum(
                smooth_l1_loss(r['dims'], g[:, 3:6]), -1) * pos) / npos
            yaw = g[:, 6] % (2 * np.pi)
            bin_id = jnp.floor(yaw / bin_w).astype(jnp.int32) % D
            bin_res = yaw - (bin_id * bin_w + bin_w / 2)
            l_dir = jnp.sum(softmax_cross_entropy(
                r['dir_cls'], bin_id) * pos) / npos
            res_pred = jnp.take_along_axis(
                r['dir_res'], bin_id[:, None], -1)[..., 0]
            l_dir_res = jnp.sum(smooth_l1_loss(
                res_pred, bin_res / (bin_w / 2)) * pos) / npos
            # corner loss (ref corner_loss:190-214)
            pred_yaw = bin_id * bin_w + bin_w / 2 \
                + res_pred * (bin_w / 2)
            pred_box = jnp.concatenate(
                [r['center'] - jnp.maximum(r['dims'], 0.01)
                 * jnp.asarray([0, 0, 0.5]),
                 jnp.maximum(r['dims'], 0.01), pred_yaw[:, None]], -1)
            pc = box_corners_3d(pred_box)
            gc = box_corners_3d(g[:, :7])
            l_corner = jnp.sum(jnp.mean(jnp.sum(
                smooth_l1_loss(pc, gc), -1), -1) * pos) / npos
            # candidate (vote) loss: shift toward the owning GT center
            _, inside_seed = points_in_boxes_local(r['seed_xyz'],
                                                   gtb[:, :7])
            inside_seed = inside_seed & gtm[None]
            pos_seed = jnp.any(inside_seed, -1) & r['cand_mask']
            gis = jnp.argmax(inside_seed, -1)
            gt_ctr_s = gtb[gis][:, :3] + gtb[gis][:, 3:6] \
                * jnp.asarray([0, 0, 0.5])
            l_vote = jnp.sum(jnp.sum(smooth_l1_loss(
                r['cand_xyz'], gt_ctr_s), -1) * pos_seed) \
                / jnp.maximum(jnp.sum(pos_seed), 1.0)
            return dict(centerness_loss=l_cls, center_loss=l_center,
                        size_res_loss=l_size, dir_class_loss=l_dir,
                        dir_res_loss=l_dir_res, corner_loss=l_corner,
                        vote_loss=l_vote)

        per = jax.vmap(one)(res, gt_bboxes, gt_labels, gt_mask)
        return {k: jnp.mean(v) for k, v in per.items()}

    # ------------------------------------------------------------ predict

    def predict_by_feat(self, res):
        D = self.num_dir_bins
        bin_w = 2 * np.pi / D

        def one(r):
            scores = jax.nn.sigmoid(r['cls_logit']) \
                * r['cand_mask'][:, None]
            bin_id = jnp.argmax(r['dir_cls'], -1)
            dres = jnp.take_along_axis(r['dir_res'], bin_id[:, None],
                                       -1)[..., 0] * (bin_w / 2)
            yaw = bin_id * bin_w + bin_w / 2 + dres
            dims = jnp.maximum(r['dims'], 0.01)
            boxes = jnp.concatenate(
                [r['center'] - dims * jnp.asarray([0, 0, 0.5]), dims,
                 yaw[:, None]], -1)
            bev = boxes[:, [0, 1, 3, 4, 6]]
            out = box3d_multiclass_nms(
                boxes, bev, scores, self.score_thr, self.nms_iou_thr,
                self.max_num, use_rotate_nms=True)
            return dict(bboxes=out['bboxes'], scores=out['scores'],
                        labels=out['labels'], mask=out['mask'])

        return jax.vmap(one)(res)
