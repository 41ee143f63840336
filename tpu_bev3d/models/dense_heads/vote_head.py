"""VoteNet head: deep Hough voting for indoor 3D detection.

Ref: mmdet3d/models/dense_heads/vote_head.py (VoteHead — vote_module
offsets seeds toward object centers, vote aggregation SA module, proposal
conv → objectness/center/size/heading/semantic branches; chamfer-style
vote + center losses).

TPU design: fixed S seeds → fixed V votes → fixed N proposals; losses are
masked chamfer distances over padded GT. Heading uses num_dir_bins
class+residual like the reference; sizes are per-class mean anchors.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS
from ...ops.nms import aligned_3d_nms_mask
from ..layers.pointnet_modules import PointSAModule, SharedMLP
from ..losses.losses import smooth_l1_loss, softmax_cross_entropy


@MODELS.register_module()
class VoteHead(nn.Module):
    num_classes: int = 10
    in_channels: int = 256
    num_proposals: int = 256
    vote_per_seed: int = 1
    # aggregation SA
    agg_radius: float = 0.3
    agg_num_sample: int = 16
    agg_channels: Sequence[int] = (128, 128, 128)
    # size anchors [num_classes, 3]
    mean_sizes: Any = None
    num_dir_bins: int = 12
    # test
    nms_iou_thr: float = 0.25
    score_thr: float = 0.05
    max_num: int = 64
    fps_chunks: int = 1   # >1 → bucketed FPS in the aggregation SA
    ballq: str = ''       # neighbor selection: ''|'exact'|'approx'

    def _mean_sizes(self):
        if self.mean_sizes is not None:
            return np.asarray(self.mean_sizes, np.float32)
        return np.ones((self.num_classes, 3), np.float32)

    @nn.compact
    def __call__(self, feat_dict, train: bool = False):
        """feat_dict: fp_xyz [B,S,3], fp_features [B,S,C], fp_mask [B,S]
        → dict of per-proposal predictions."""
        seed_xyz = feat_dict['fp_xyz']
        seed_feat = feat_dict['fp_features']
        seed_mask = feat_dict['fp_mask']
        B, S, C = seed_feat.shape

        # --- vote module (ref VoteModule): MLP → xyz offset + feat delta
        h = SharedMLP((C, C), name='vote_mlp')(seed_feat, seed_mask, train)
        out = nn.Dense(3 + C, name='vote_out')(h)
        vote_xyz = seed_xyz + out[..., :3]
        vote_feat = seed_feat + out[..., 3:]

        # --- aggregation: SA module over votes, FPS num_proposals centers
        vm_agg = nn.vmap(
            lambda m, vx, vf, vmask: m(vx, vf, vmask),
            variable_axes={'params': None}, split_rngs={'params': False},
            in_axes=(0, 0, 0))
        # build the SA module once, vmap its apply over the batch
        agg = PointSAModule(self.num_proposals, self.agg_radius,
                            self.agg_num_sample, tuple(self.agg_channels),
                            fps_chunks=self.fps_chunks, ballq=self.ballq,
                            name='agg')
        ctr_xyz, ctr_feat, ctr_mask, _ = vm_agg(agg, vote_xyz, vote_feat,
                                                seed_mask)

        # --- proposal branches
        h = SharedMLP((128, 128), name='pred_mlp')(ctr_feat, ctr_mask,
                                                   train)
        K = self.num_classes
        D = self.num_dir_bins
        out_dim = 2 + 3 + D * 2 + K * 3 + K  # obj, center, dir, size, sem
        p = nn.Dense(out_dim, name='pred_out')(h)
        i = 0
        obj = p[..., i:i + 2]; i += 2
        center = ctr_xyz + p[..., i:i + 3]; i += 3
        dir_cls = p[..., i:i + D]; i += D
        dir_res = p[..., i:i + D]; i += D
        size_res = p[..., i:i + K * 3].reshape(B, -1, K, 3); i += K * 3
        sem = p[..., i:i + K]
        return dict(seed_xyz=seed_xyz, vote_xyz=vote_xyz, seed_mask=seed_mask,
                    obj=obj, center=center, dir_cls=dir_cls,
                    dir_res=dir_res, size_res=size_res, sem=sem,
                    mask=ctr_mask)

    # --------------------------------------------------------------- loss

    def loss_by_feat(self, res, gt_bboxes, gt_labels, gt_mask):
        mean_sizes = jnp.asarray(self._mean_sizes())
        D = self.num_dir_bins

        def one(r, gtb, gtl, gtm):
            gt_ctr = gtb[:, :3] + gtb[:, 3:6] * jnp.asarray([0, 0, 0.5])
            big = 1e6
            # vote loss: seeds inside a GT box vote toward its center
            d_seed = jnp.linalg.norm(
                r['seed_xyz'][:, None] - gt_ctr[None], axis=-1)
            d_seed = jnp.where(gtm[None], d_seed, big)
            near = jnp.argmin(d_seed, -1)
            # seed is "on object" if within half-diagonal of its box
            half_diag = 0.5 * jnp.linalg.norm(gtb[:, 3:6], axis=-1)
            on_obj = (jnp.min(d_seed, -1) < half_diag[near]) \
                & r['seed_mask'] & gtm[near]
            vote_tgt = gt_ctr[near]
            l_vote = jnp.sum(
                jnp.linalg.norm(r['vote_xyz'] - vote_tgt, axis=-1)
                * on_obj) / jnp.maximum(jnp.sum(on_obj), 1.0)

            # proposal assignment: nearest GT center
            d_prop = jnp.linalg.norm(
                r['center'][:, None] - gt_ctr[None], axis=-1)
            d_prop = jnp.where(gtm[None], d_prop, big)
            nearest = jnp.argmin(d_prop, -1)
            dmin = jnp.min(d_prop, -1)
            pos = (dmin < 0.3) & r['mask']
            neg = (dmin > 0.6) & r['mask']
            npos = jnp.maximum(jnp.sum(pos), 1.0)

            l_obj = jnp.sum(
                softmax_cross_entropy(r['obj'], pos.astype(jnp.int32))
                * (pos | neg)) / jnp.maximum(jnp.sum(pos | neg), 1.0)
            l_center = jnp.sum(
                jnp.sum(smooth_l1_loss(r['center'], gt_ctr[nearest]), -1)
                * pos) / npos
            # heading bin + residual
            yaw = gtb[:, 6] % (2 * jnp.pi)
            bin_w = 2 * jnp.pi / D
            bin_id = jnp.floor(yaw / bin_w).astype(jnp.int32) % D
            bin_res = yaw - (bin_id * bin_w + bin_w / 2)
            l_dir = jnp.sum(
                softmax_cross_entropy(r['dir_cls'], bin_id[nearest])
                * pos) / npos
            res_pred = jnp.take_along_axis(
                r['dir_res'], bin_id[nearest][:, None], -1)[..., 0]
            l_dir_res = jnp.sum(
                smooth_l1_loss(res_pred, bin_res[nearest] / (bin_w / 2))
                * pos) / npos
            # size: class residual vs mean size
            cls = jnp.clip(gtl[nearest], 0)
            # gather along the CLASS axis (1); axis-2 indexing with
            # class ids NaN-fills for classes >= 3 (JAX OOB gather)
            sz_pred = jnp.take_along_axis(
                r['size_res'], cls[:, None, None], 1)[:, 0]
            sz_tgt = (gtb[nearest][:, 3:6] - mean_sizes[cls]) \
                / jnp.maximum(mean_sizes[cls], 1e-3)
            l_size = jnp.sum(
                jnp.sum(smooth_l1_loss(sz_pred, sz_tgt), -1) * pos) / npos
            l_sem = jnp.sum(
                softmax_cross_entropy(r['sem'], cls) * pos) / npos
            return dict(vote_loss=l_vote, objectness_loss=l_obj,
                        center_loss=l_center, dir_class_loss=l_dir,
                        dir_res_loss=l_dir_res, size_res_loss=l_size,
                        semantic_loss=l_sem)

        per = jax.vmap(one)(res, gt_bboxes, gt_labels, gt_mask)
        return {k: jnp.mean(v) for k, v in per.items()}

    # ------------------------------------------------------------ predict

    def predict_by_feat(self, res):
        mean_sizes = jnp.asarray(self._mean_sizes())
        D = self.num_dir_bins
        bin_w = 2 * np.pi / D

        def one(r):
            obj_score = jax.nn.softmax(r['obj'], -1)[..., 1]
            sem_cls = jnp.argmax(r['sem'], -1)
            sem_score = jnp.max(jax.nn.softmax(r['sem'], -1), -1)
            scores = obj_score * sem_score
            bin_id = jnp.argmax(r['dir_cls'], -1)
            dres = jnp.take_along_axis(r['dir_res'], bin_id[:, None],
                                       -1)[..., 0] * (bin_w / 2)
            yaw = bin_id * bin_w + bin_w / 2 + dres
            # size_res [Q, num_classes, 3]: gather the predicted class's
            # row (axis=1!). Indexing axis 2 with class ids silently
            # NaN-filled for classes >= 3 (JAX OOB gather fill) — caught
            # by the real-ScanNet fixture (18 classes).
            sz = jnp.take_along_axis(
                r['size_res'], sem_cls[:, None, None], 1)[:, 0]
            dims = mean_sizes[sem_cls] * (1 + sz)
            dims = jnp.maximum(dims, 0.01)
            ctr = r['center']
            boxes = jnp.concatenate(
                [ctr - dims * jnp.asarray([0, 0, 0.5]), dims,
                 yaw[:, None]], -1)
            # axis-aligned corners for the indoor NMS
            aab = jnp.concatenate([ctr - dims / 2, ctr + dims / 2], -1)
            valid = r['mask'] & (scores > self.score_thr)
            keep = aligned_3d_nms_mask(aab, scores, sem_cls, valid,
                                       self.nms_iou_thr)
            top, idx = jax.lax.top_k(
                jnp.where(keep, scores, -1.0), self.max_num)
            return dict(bboxes=boxes[idx], scores=jnp.maximum(top, 0.0),
                        labels=sem_cls[idx], mask=top > 0)

        return jax.vmap(one)({k: v for k, v in res.items()})
