"""MVXNet: point-level camera-LiDAR fusion.

Ref: mmdet3d/models/detectors/mvx_faster_rcnn.py (DynamicMVXFasterRCNN) +
models/layers/fusion_layers/point_fusion.py — every LiDAR point samples
the image feature at its camera projection; the sampled feature is fused
into the point feature before voxel encoding.

TPU form: one einsum projects all points into all cameras; bilinear
sampling is 4 gathers; the fused per-point features feed the standard
DynamicVFE → scatter → BEV pipeline.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from .imvoxelnet import sample_image_features
from .voxelnet import DynamicVoxelNet


@MODELS.register_module()
class PointFusion(nn.Module):
    """Sample + project image features onto points (ref point_fusion.py)."""
    img_channels: int = 256
    out_channels: int = 64
    image_size: Any = (256, 704)

    @nn.compact
    def __call__(self, points, points_mask, img_feats, lidar2img):
        """points [B,P,C]; img_feats [B,N,fh,fw,Ci]; lidar2img [B,N,4,4]
        → fused per-point image features [B, P, out_channels]."""
        B, P, _ = points.shape
        N, fh, fw = img_feats.shape[1:4]
        sx = fw / self.image_size[1]
        sy = fh / self.image_size[0]
        hom = jnp.concatenate(
            [points[..., :3], jnp.ones_like(points[..., :1])], -1)
        proj = jnp.einsum('bnij,bpj->bnpi', lidar2img, hom)
        z = proj[..., 2]
        uv = proj[..., :2] / jnp.maximum(z[..., None], 1e-3)
        uv = uv * jnp.asarray([sx, sy])
        ok = (z > 0.5) & (uv[..., 0] >= 0) & (uv[..., 0] < fw - 1) \
            & (uv[..., 1] >= 0) & (uv[..., 1] < fh - 1) \
            & points_mask[:, None, :]

        def per_batch(fb, uvb, okb):
            s = jax.vmap(sample_image_features)(fb, uvb, okb)  # [N,P,Ci]
            cnt = jnp.maximum(okb.sum(0), 1)[:, None]
            return s.sum(0) / cnt

        sampled = jax.vmap(per_batch)(img_feats, uv, ok)       # [B,P,Ci]
        return nn.Dense(self.out_channels, name='fuse')(sampled)


@MODELS.register_module()
class MVXNet(DynamicVoxelNet):
    """Dynamic voxel detector with point-level image fusion
    (ref DynamicMVXFasterRCNN)."""
    img_backbone: Any = None
    img_neck: Any = None
    fusion_layer: Any = None
    image_size: Any = (256, 704)

    def setup(self):
        super().setup()
        self._img_backbone = MODELS.build(dict(self.img_backbone))
        self._img_neck = MODELS.build(dict(self.img_neck)) \
            if self.img_neck else None
        self._fusion = MODELS.build(dict(self.fusion_layer))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        imgs = batch['imgs']
        B, N, H, W, C = imgs.shape
        f = self._img_backbone(imgs.reshape(B * N, H, W, C), train=train)
        if self._img_neck is not None:
            f = self._img_neck(f, train=train)
        f = f[0]
        fh, fw, fc = f.shape[1:]
        img_feats = f.reshape(B, N, fh, fw, fc)
        pt_img = self._fusion(batch['points'], batch['points_mask'],
                              img_feats, batch['lidar2img'])
        points = jnp.concatenate([batch['points'], pt_img], -1)
        feats = self.extract_feat(points, batch['points_mask'], train=train)
        outs = self._bbox_head(feats, train=train)
        if mode == 'tensor':
            return outs
        if mode == 'loss':
            return self._bbox_head.loss_by_feat(
                outs, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(outs)
        raise ValueError(mode)
