"""StreamPETR: temporal streaming camera-only detection.

Ref: projects/StreamPETR/stream_petr/models/detectors/petr3d.py +
dense_heads/streampetr_head.py:42 — object queries propagated across
frames (top-k confident queries carry their embedding + 3D reference
point into the next frame, ego-motion compensated), giving temporal
fusion without BEV cost volumes. The reference's GroupStreamingSampler
(scene-contiguous batches) maps to the caller feeding frames in order.

TPU design: the memory is a fixed-size pytree (no growth), so the
streaming step is one jittable function (memory in → memory out); scan
over a clip works with lax.scan.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..dense_heads.petr_head import PETRHead, inverse_sigmoid


@MODELS.register_module()
class StreamPETR(nn.Module):
    img_backbone: Any = None
    img_neck: Any = None
    bbox_head: Any = None
    image_size: Any = (256, 704)
    num_propagated: int = 128

    def setup(self):
        self._img_backbone = MODELS.build(dict(self.img_backbone))
        self._img_neck = MODELS.build(dict(self.img_neck)) \
            if self.img_neck else None
        head_cfg = dict(self.bbox_head)
        head_cfg['num_memory'] = self.num_propagated
        self._bbox_head = MODELS.build(head_cfg)

    def empty_memory(self, batch_size: int):
        d = self._bbox_head.embed_dims
        M = self.num_propagated
        return dict(
            feat=jnp.zeros((batch_size, M, d)),
            ref=jnp.full((batch_size, M, 3), 0.5),
            valid=jnp.zeros((batch_size, M), bool))

    def extract_feat(self, imgs, train=False):
        B, N, H, W, C = imgs.shape
        x = imgs.reshape(B * N, H, W, C)
        feats = self._img_backbone(x, train=train)
        if self._img_neck is not None:
            feats = self._img_neck(feats, train=train)
        f = feats[0]
        fh, fw, fc = f.shape[1:]
        return f.reshape(B, N, fh, fw, fc)

    def __call__(self, batch, memory=None, mode: str = 'tensor',
                 train: bool = False):
        """batch additionally may carry ego_motion [B,4,4] (prev→cur lidar
        frame transform) to compensate propagated reference points."""
        B = batch['imgs'].shape[0]
        if memory is None:
            memory = self.empty_memory(B)
        # ego-motion compensation of memory reference points
        if 'ego_motion' in batch:
            pr = jnp.asarray(self._bbox_head.pc_range)
            world = memory['ref'] * (pr[3:] - pr[:3]) + pr[:3]
            T = batch['ego_motion']
            world = jnp.einsum('bij,bmj->bmi', T[:, :3, :3], world) \
                + T[:, None, :3, 3]
            memory = dict(memory,
                          ref=jnp.clip((world - pr[:3])
                                       / (pr[3:] - pr[:3]), 0, 1))
        feats = self.extract_feat(batch['imgs'], train=train)
        cam_params = {k: batch[k] for k in ('cam2lidar', 'intrins')
                      if k in batch}
        outs = self._bbox_head(feats, cam_params,
                               image_size=tuple(self.image_size),
                               memory=memory, train=train)
        # build next-frame memory: top-k confident queries
        scores = jax.nn.sigmoid(outs['all_cls'][-1]).max(-1)   # [B, Q]
        top, idx = jax.lax.top_k(scores, self.num_propagated)
        new_memory = dict(
            feat=jax.vmap(lambda q, i: q[i])(outs['query_feat'], idx),
            ref=jax.vmap(lambda r, i: r[i])(
                outs['all_bbox'][-1][..., :3], idx),
            valid=top > 0.1)
        if mode == 'tensor':
            return outs, new_memory
        if mode == 'loss':
            return self._bbox_head.loss_by_feat(
                outs, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask']), new_memory
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(outs), new_memory
        raise ValueError(mode)


@MODELS.register_module()
class StreamPETRHead(PETRHead):
    """PETRHead + propagated-memory queries appended to the learned set
    (ref streampetr_head.py hybrid query propagation)."""
    num_memory: int = 128

    @nn.compact
    def __call__(self, img_feats, cam_params, image_size=(256, 704),
                 memory=None, train: bool = False):
        B, N, fH, fW, C = img_feats.shape
        kv = nn.Dense(self.embed_dims, name='input_proj')(
            img_feats.reshape(B, N * fH * fW, C))
        k_pos = self._position_encoding_3d(
            img_feats.shape, cam_params, image_size).astype(kv.dtype)

        ref = self.param('reference_points',
                         nn.initializers.uniform(scale=1.0),
                         (self.num_query, 3))
        ref_b = jnp.broadcast_to(ref[None], (B,) + ref.shape)
        q = jnp.zeros((B, self.num_query, self.embed_dims), kv.dtype)
        if memory is not None:
            mfeat = memory['feat'].astype(kv.dtype) \
                * memory['valid'][..., None]
            mref = memory['ref']
            ref_b = jnp.concatenate([ref_b, mref], 1)
            q = jnp.concatenate([q, mfeat], 1)
        q_pos = nn.Dense(self.embed_dims, name='query_pos_fc1')(ref_b)
        q_pos = nn.relu(q_pos)
        q_pos = nn.Dense(self.embed_dims, name='query_pos_fc2')(q_pos)

        from ..dense_heads.petr_head import PETRDecoderLayer
        code = 10 if self.with_velocity else 8
        all_cls, all_bbox = [], []
        for li in range(self.num_layers):
            q = PETRDecoderLayer(self.embed_dims, self.nhead,
                                 name=f'layer_{li}')(q, kv, q_pos, k_pos)
            h = nn.LayerNorm(name=f'post_norm_{li}')(q)
            cls = nn.Dense(self.num_classes, name=f'cls_{li}')(
                nn.relu(nn.Dense(self.embed_dims,
                                 name=f'cls_fc_{li}')(h)))
            reg = nn.Dense(code, name=f'reg_{li}')(
                nn.relu(nn.Dense(self.embed_dims,
                                 name=f'reg_fc_{li}')(h)))
            xyz = jax.nn.sigmoid(reg[..., :3] + inverse_sigmoid(ref_b))
            reg = jnp.concatenate([xyz, reg[..., 3:]], -1)
            all_cls.append(cls)
            all_bbox.append(reg)
        return dict(all_cls=jnp.stack(all_cls),
                    all_bbox=jnp.stack(all_bbox), reference=ref_b,
                    query_feat=q)
