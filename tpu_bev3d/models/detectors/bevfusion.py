"""BEVFusion LiDAR+camera detector — the flagship pipeline.

Ref: projects/BEVFusion/bevfusion/bevfusion.py:20-399 —
  points → Voxelization → HardSimpleVFE → BEVFusionSparseEncoder(256C)
  ∥ img → Swin → GeneralizedLSSFPN → DepthLSSTransform(80C)
  → ConvFuser(336→256) → SECOND → SECONDFPN(512C) → BEVFusionHead.

TPU design: one jittable forward over a fixed-shape batch. Voxelization is
the fused sort+segment kernel with 'mean' reduce (bevfusion.py:228-253's
per-sample loop + mean reduce, done batched without host loops). The view
transform runs in fp32 (ref autocast island, bevfusion.py:177). Camera batch
fields:
  imgs [B, Ncam, H, W, 3]; cam2lidar [B,N,4,4]; intrins [B,N,3,3];
  post_rots [B,N,3,3]; post_trans [B,N,3]; lidar2img [B,N,4,4];
  (optional) lidar_aug [B,4,4].
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import batch_hard_voxelize
from ...registry import MODELS
from ..layers.common import ConvBNAct


@MODELS.register_module()
class ConvFuser(nn.Module):
    """concat → 3×3 conv BN ReLU (ref bevfusion_head.py:26-38)."""
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = jnp.concatenate(feats, -1)
        return ConvBNAct(self.out_channels, 3, padding=1,
                         bn_eps=1e-5)(x, train)


@MODELS.register_module()
class BEVFusion(nn.Module):
    voxel_encoder: Any = None
    middle_encoder: Any = None
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    # camera branch (all optional → lidar-only mode)
    img_backbone: Any = None
    img_neck: Any = None
    view_transform: Any = None
    fuser: Any = None
    # voxelization
    voxel_size: Any = (0.075, 0.075, 0.2)
    point_cloud_range: Any = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    max_num_points: int = 10
    max_voxels: int = 120000
    # route points straight into the middle encoder's sort-free fused
    # scatter (BEVColumnEncoder.encode-points path)
    fused_voxelize: bool = False
    depth_loss_weight: float = 1.0
    # 'bfloat16' runs backbones/necks/sparse conv in bf16 with fp32 islands
    # (view-transform geometry + head), mirroring the reference's AMP
    # autocast islands (bevfusion.py:177,201; tools/train.py:92-104)
    compute_dtype: str = 'float32'
    # the head's matmuls/convs can run in bf16 (decode + loss paths stay
    # fp32 inside the head — see transfusion_head.py fp32 cast)
    head_dtype: str = 'float32'

    def setup(self):
        self._voxel_encoder = MODELS.build(dict(self.voxel_encoder)) \
            if self.voxel_encoder else None
        # camera-only variant (ref BEVFusion supports lidar-less configs,
        # projects/BEVFusion/bevfusion/bevfusion.py extract_feat): no
        # middle encoder -> the lidar branch is skipped entirely
        self._middle_encoder = MODELS.build(dict(self.middle_encoder)) \
            if self.middle_encoder else None
        self._backbone = MODELS.build(dict(self.backbone))
        self._neck = MODELS.build(dict(self.neck)) if self.neck else None
        self._bbox_head = MODELS.build(dict(self.bbox_head))
        self._img_backbone = MODELS.build(dict(self.img_backbone)) \
            if self.img_backbone else None
        self._img_neck = MODELS.build(dict(self.img_neck)) \
            if self.img_neck else None
        self._view_transform = MODELS.build(dict(self.view_transform)) \
            if self.view_transform else None
        self._fuser = MODELS.build(dict(self.fuser)) if self.fuser else None

    # ------------------------------------------------------------- branches

    def extract_pts_feat(self, points, points_mask, train=False):
        """Ref extract_pts_feat:195-256: hard-voxelize + mean reduce fused."""
        B = points.shape[0]
        if self.fused_voxelize:
            # sort-free points→canvas path (BEVColumnEncoder fast path,
            # see fused_point_stem_scatter): skips hard-voxelize entirely
            return self._middle_encoder(
                points=points.astype(jnp.dtype(self.compute_dtype)),
                points_mask=points_mask, train=train)
        vox = batch_hard_voxelize(
            points, points_mask, voxel_size=tuple(self.voxel_size),
            pc_range=tuple(self.point_cloud_range),
            max_points=self.max_num_points,
            max_voxels_per_sample=self.max_voxels, reduce='mean')
        vf = vox['voxels'].astype(jnp.dtype(self.compute_dtype))
        return self._middle_encoder(vf, vox['coords'], B, train=train)

    def extract_img_feat(self, batch, train=False):
        """Ref extract_img_feat:143-193."""
        imgs = batch['imgs'].astype(jnp.dtype(self.compute_dtype))
        B, N, H, W, C = imgs.shape
        x = imgs.reshape(B * N, H, W, C)
        feats = self._img_backbone(x, train=train)
        feats = self._img_neck(feats, train=train)
        f = feats[0]                     # finest level (ref uses outs[0])
        fh, fw, fc = f.shape[1:]
        f = f.reshape(B, N, fh, fw, fc)
        cam_params = {k: batch[k] for k in
                      ('cam2lidar', 'intrins', 'post_rots', 'post_trans',
                       'lidar2img', 'geom_ranks', 'camera_mask')
                      if k in batch}
        if 'lidar_aug' in batch:
            cam_params['lidar_aug'] = batch['lidar_aug']
        bev_img, depth_logits = self._view_transform(
            f, cam_params, points=batch.get('points'),
            points_mask=batch.get('points_mask'), train=train)
        return bev_img, depth_logits, cam_params

    def extract_feat(self, batch, train=False):
        """Ref extract_feat:294-381."""
        feats = []
        depth_logits = cam_params = None
        if self._img_backbone is not None and 'imgs' in batch:
            bev_img, depth_logits, cam_params = self.extract_img_feat(
                batch, train)
            feats.append(bev_img)
        if self._middle_encoder is not None:
            pts_bev = self.extract_pts_feat(batch['points'],
                                            batch['points_mask'], train)
            feats.append(pts_bev)
        if self._fuser is not None and len(feats) > 1:
            x = self._fuser(feats, train=train)
        else:
            x = feats[-1]
        x = self._backbone(x, train=train)
        if self._neck is not None:
            x = self._neck(x, train=train)
        return x, depth_logits, cam_params

    # ------------------------------------------------------------- dispatch

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        x, depth_logits, cam_params = self.extract_feat(batch, train)
        # head island: fp32 by default; bf16 opt-in keeps decode fp32
        res = self._bbox_head(x.astype(jnp.dtype(self.head_dtype)),
                              train=train)
        if mode == 'tensor':
            return res
        if mode == 'loss':
            losses = self._bbox_head.loss_by_feat(
                res, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
            if (depth_logits is not None
                    and hasattr(self._view_transform, 'depth_loss')):
                losses['loss_depth'] = self.depth_loss_weight * \
                    self._view_transform.depth_loss(
                        depth_logits, batch['points'], batch['points_mask'],
                        cam_params)
            return losses
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(res)
        raise ValueError(mode)
