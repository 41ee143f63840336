"""ImVoxelNet: multi-view camera → 3D voxel volume → BEV detection.

Ref: mmdet3d/models/detectors/imvoxelnet.py + dense_heads (ImVoxel path):
image features are gathered INTO a fixed voxel grid by projecting every
voxel center into each camera and bilinearly sampling (the inverse
direction of LSS lifting), averaged over the cameras that see it, then a
small 3D neck collapses z and a standard BEV head detects.

TPU notes: the voxel→pixel projection is one einsum over all V voxels ×
N cams; bilinear sampling is 4 gathers — all fixed-shape. Volume
[nx, ny, nz, C] stays modest (e.g. 216×216×12×64 ≈ 70 MB bf16).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct


def sample_image_features(feats, uv, valid):
    """feats [fh, fw, C]; uv [..., 2] in feature coords → [..., C]."""
    fh, fw, C = feats.shape
    u = jnp.clip(uv[..., 0], 0, fw - 1 - 1e-4)
    v = jnp.clip(uv[..., 1], 0, fh - 1 - 1e-4)
    iu, iv = jnp.floor(u).astype(jnp.int32), jnp.floor(v).astype(jnp.int32)
    du, dv = u - iu, v - iv
    f = (feats[iv, iu] * ((1 - dv) * (1 - du))[..., None]
         + feats[iv, iu + 1] * ((1 - dv) * du)[..., None]
         + feats[iv + 1, iu] * (dv * (1 - du))[..., None]
         + feats[iv + 1, iu + 1] * (dv * du)[..., None])
    return f * valid[..., None].astype(f.dtype)


@MODELS.register_module()
class ImVoxelNet(nn.Module):
    img_backbone: Any = None
    img_neck: Any = None
    bbox_head: Any = None
    n_voxels: Sequence[int] = (216, 216, 12)       # (nx, ny, nz)
    point_cloud_range: Sequence[float] = (-50, -50, -5, 50, 50, 3)
    image_size: Sequence[int] = (256, 704)
    out_channels: int = 64

    def setup(self):
        self._img_backbone = MODELS.build(dict(self.img_backbone))
        self._img_neck = MODELS.build(dict(self.img_neck)) \
            if self.img_neck else None
        self._bbox_head = MODELS.build(dict(self.bbox_head))
        self._proj = nn.Dense(self.out_channels)
        self._neck3d = [ConvBNAct(self.out_channels, 3, padding=1)
                        for _ in range(2)]

    def _voxel_centers(self):
        pcr = np.asarray(self.point_cloud_range, np.float32)
        nx, ny, nz = self.n_voxels
        xs = np.linspace(pcr[0], pcr[3], nx, endpoint=False) \
            + (pcr[3] - pcr[0]) / nx / 2
        ys = np.linspace(pcr[1], pcr[4], ny, endpoint=False) \
            + (pcr[4] - pcr[1]) / ny / 2
        zs = np.linspace(pcr[2], pcr[5], nz, endpoint=False) \
            + (pcr[5] - pcr[2]) / nz / 2
        gx, gy, gz = np.meshgrid(xs, ys, zs, indexing='ij')
        return jnp.asarray(
            np.stack([gx, gy, gz], -1).reshape(-1, 3))     # [V, 3]

    def extract_feat(self, batch, train=False):
        imgs = batch['imgs']
        B, N, H, W, C = imgs.shape
        x = imgs.reshape(B * N, H, W, C)
        feats = self._img_backbone(x, train=train)
        if self._img_neck is not None:
            feats = self._img_neck(feats, train=train)
        f = feats[0]
        fh, fw, fc = f.shape[1:]
        f = self._proj(f).reshape(B, N, fh, fw, self.out_channels)
        sx, sy = fw / self.image_size[1], fh / self.image_size[0]

        ctr = self._voxel_centers()                        # [V, 3]
        hom = jnp.concatenate([ctr, jnp.ones_like(ctr[:, :1])], -1)
        proj = jnp.einsum('bnij,vj->bnvi', batch['lidar2img'], hom)
        z = proj[..., 2]
        uv = proj[..., :2] / jnp.maximum(z[..., None], 1e-3)
        uv = uv * jnp.asarray([sx, sy])
        ok = (z > 0.5) & (uv[..., 0] >= 0) & (uv[..., 0] < fw - 1) \
            & (uv[..., 1] >= 0) & (uv[..., 1] < fh - 1)

        def per_batch(fb, uvb, okb):
            s = jax.vmap(sample_image_features)(fb, uvb, okb)  # [N,V,C]
            cnt = jnp.maximum(okb.sum(0), 1)[:, None]
            return s.sum(0) / cnt                           # [V, C]

        vol = jax.vmap(per_batch)(f, uv, ok)                # [B, V, C]
        nx, ny, nz = self.n_voxels
        vol = vol.reshape(B, nx, ny, nz, self.out_channels)
        # collapse z into channels after two 3D-ish convs over (x, y)
        vol = vol.reshape(B, nx, ny, nz * self.out_channels)
        # (x, y) → (row=y, col=x) NHWC for the BEV stack
        bev = jnp.transpose(vol, (0, 2, 1, 3))
        for conv in self._neck3d:
            bev = conv(bev, train)
        return bev

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        bev = self.extract_feat(batch, train)
        outs = self._bbox_head(bev, train=train)
        if mode == 'tensor':
            return outs
        if mode == 'loss':
            return self._bbox_head.loss_by_feat(
                outs, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(outs)
        raise ValueError(mode)
