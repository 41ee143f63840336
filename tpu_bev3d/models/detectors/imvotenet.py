"""ImVoteNet: fusing 2D image votes with 3D point votes.

Refs: mmdet3d/models/detectors/imvotenet.py and
models/layers/fusion_layers/vote_fusion.py:16-200 — for each 3D seed,
project into the image, find the covering 2D detection, and build three
cue groups: geometric (the ray toward the 2D box center lifted to 3D),
semantic (the detection's class one-hot × score) and texture (the RGB at
the seed's pixel). Cues concatenate with the point features and feed the
VoteNet head (the reference's joint tower).

TPU design: fixed M 2D detections per image as batch inputs
('bboxes_2d' [B,M,4] xyxy, 'scores_2d' [B,M], 'labels_2d' [B,M],
'mask_2d' [B,M]); the covering-box choice is a masked argmax.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS


@MODELS.register_module()
class VoteFusion(nn.Module):
    """Ref vote_fusion.py:16-200."""
    num_classes: int = 10

    @nn.compact
    def __call__(self, seeds_xyz, seed_mask, imgs, bboxes_2d, scores_2d,
                 labels_2d, mask_2d, cam2img):
        """→ per-seed image cues [B, S, 3+K+3] + validity [B, S]."""
        B, S = seeds_xyz.shape[:2]
        iH, iW = imgs.shape[1:3]
        fx = cam2img[:, 0, 0][:, None]
        fy = cam2img[:, 1, 1][:, None]
        cx = cam2img[:, 0, 2][:, None]
        cy = cam2img[:, 1, 2][:, None]
        z = jnp.maximum(seeds_xyz[..., 2], 0.1)
        u = seeds_xyz[..., 0] / z * fx + cx
        v = seeds_xyz[..., 1] / z * fy + cy
        in_img = (u >= 0) & (u < iW) & (v >= 0) & (v < iH) & seed_mask

        # covering 2D box: highest-score box containing (u, v)
        inside = ((u[:, :, None] >= bboxes_2d[:, None, :, 0])
                  & (u[:, :, None] <= bboxes_2d[:, None, :, 2])
                  & (v[:, :, None] >= bboxes_2d[:, None, :, 1])
                  & (v[:, :, None] <= bboxes_2d[:, None, :, 3])
                  & mask_2d[:, None])
        score_in = jnp.where(inside, scores_2d[:, None], -1.0)
        best = jnp.argmax(score_in, -1)                      # [B, S]
        has = jnp.max(score_in, -1) > 0
        bb = jnp.take_along_axis(bboxes_2d, best[..., None], 1)
        bcx = (bb[..., 0] + bb[..., 2]) / 2
        bcy = (bb[..., 1] + bb[..., 3]) / 2
        # geometric cue: displacement of the 2D box center ray at seed
        # depth (ref: pseudo-3D vote toward the object center)
        dx3 = (bcx - u) / fx * z
        dy3 = (bcy - v) / fy * z
        geo = jnp.stack([dx3, dy3, jnp.zeros_like(dx3)], -1)
        # semantic cue: covering box class one-hot × score
        lbl = jnp.take_along_axis(labels_2d, best, 1)
        sc = jnp.take_along_axis(scores_2d, best, 1)
        sem = jax.nn.one_hot(lbl, self.num_classes) * sc[..., None]
        # texture cue: image RGB at the seed pixel
        iu = jnp.clip(u.astype(jnp.int32), 0, iW - 1)
        iv = jnp.clip(v.astype(jnp.int32), 0, iH - 1)
        tex = jax.vmap(lambda im, yy, xx: im[yy, xx])(imgs, iv, iu)
        valid = in_img & has
        cues = jnp.concatenate([geo, sem, tex], -1) \
            * valid[..., None].astype(geo.dtype)
        return cues, valid


@MODELS.register_module()
class ImVoteNet(nn.Module):
    backbone: Any = None
    fusion_layer: Any = None
    bbox_head: Any = None

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._fusion = MODELS.build(dict(self.fusion_layer))
        self._bbox_head = MODELS.build(dict(self.bbox_head))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        feat = self._backbone(batch['points'], batch['points_mask'],
                              train=train)
        cues, _ = self._fusion(
            feat['fp_xyz'], feat['fp_mask'], batch['imgs'],
            batch['bboxes_2d'], batch['scores_2d'], batch['labels_2d'],
            batch['mask_2d'], batch['cam2img'])
        fused = dict(feat)
        fused['fp_features'] = jnp.concatenate(
            [feat['fp_features'], cues], -1)
        res = self._bbox_head(fused, train=train)
        if mode == 'tensor':
            return res
        if mode == 'loss':
            return self._bbox_head.loss_by_feat(
                res, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(res)
        raise ValueError(mode)
