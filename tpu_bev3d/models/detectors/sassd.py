"""SA-SSD: structure-aware auxiliary supervision on the middle encoder.

Ref: mmdet3d/models/detectors/sassd.py + middle_encoders/sparse_encoder.py
SparseEncoderSASSD:245 (point-wise foreground segmentation + center-offset
auxiliary losses interpolated from intermediate voxel features via
three_nn/three_interpolate).

TPU form: per-point BEV bilinear sampling of the middle-encoder output
feeds a small MLP predicting (foreground logit, center offset); auxiliary
losses supervise with points_in_rbbox-derived targets. Train-time only —
inference is exactly VoxelNet.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..losses.losses import binary_cross_entropy_with_logits, smooth_l1_loss
from ..roi_heads.bev_roi_head import bilinear_sample_bev
from .voxelnet import VoxelNet


@MODELS.register_module()
class SASSD(VoxelNet):
    aux_loss_weight: float = 1.0

    def setup(self):
        super().setup()
        self._aux_mlp = nn.Dense(64)
        self._aux_out = nn.Dense(3)   # fg logit + center offset (dx, dy)

    def _aux_losses(self, bev_feats, points, points_mask, gt_bboxes,
                    gt_mask):
        """bev_feats [B, H, W, C]; per-point fg/center supervision."""
        from ...structures.boxes3d import points_in_rbbox
        pcr = tuple(self.point_cloud_range)

        def one(feat, pts, pmask, gtb, gtm):
            f = bilinear_sample_bev(feat, pts[:, :2], pcr, None)
            h = nn.relu(self._aux_mlp(f))
            out = self._aux_out(h)
            fg_logit = out[:, 0]
            off_pred = out[:, 1:3]
            inside = points_in_rbbox(pts[:, :3], gtb[:, :7])  # [P, G]
            inside = inside & gtm[None, :]
            is_fg = jnp.any(inside, -1)
            gidx = jnp.argmax(inside, -1)
            ctr_off = gtb[gidx][:, :2] - pts[:, :2]
            l_fg = jnp.sum(binary_cross_entropy_with_logits(
                fg_logit, is_fg.astype(jnp.float32)) * pmask) \
                / jnp.maximum(jnp.sum(pmask), 1.0)
            w = (is_fg & pmask).astype(jnp.float32)
            l_ctr = jnp.sum(smooth_l1_loss(off_pred, ctr_off)
                            * w[:, None]) / jnp.maximum(jnp.sum(w), 1.0)
            return l_fg, l_ctr

        l_fg, l_ctr = jax.vmap(one)(bev_feats, points, points_mask,
                                    gt_bboxes, gt_mask)
        return dict(aux_loss_fg=self.aux_loss_weight * jnp.mean(l_fg),
                    aux_loss_center=self.aux_loss_weight * jnp.mean(l_ctr))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        B = batch['points'].shape[0]
        from ...ops.voxelize import batch_hard_voxelize
        vox = batch_hard_voxelize(
            batch['points'], batch['points_mask'],
            voxel_size=tuple(self.voxel_size),
            pc_range=tuple(self.point_cloud_range),
            max_points=self.max_num_points,
            max_voxels_per_sample=self.max_voxels)
        vf = self._voxel_encoder(vox['voxels'], vox['num_points'],
                                 vox['coords'], train=train)
        mid = self._middle_encoder(vf, vox['coords'], B, train=train)
        x = self._backbone(mid, train=train)
        if self._neck is not None:
            x = self._neck(x, train=train)
        outs = self._bbox_head(x, train=train)
        if mode != 'loss':
            # touch aux params so init (mode='tensor') creates them; DCE'd
            # from predict graphs
            _ = self._aux_out(nn.relu(self._aux_mlp(
                jnp.zeros((1, mid.shape[-1])))))
        if mode == 'tensor':
            return outs
        if mode == 'loss':
            losses = self._bbox_head.loss_by_feat(
                outs, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
            losses.update(self._aux_losses(
                mid, batch['points'], batch['points_mask'],
                batch['gt_bboxes_3d'], batch['gt_mask']))
            return losses
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(outs)
        raise ValueError(mode)
