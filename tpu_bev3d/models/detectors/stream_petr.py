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
import numpy as np
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


@MODELS.register_module()
class StreamPETRHeadDN(StreamPETRHead):
    """Denoising variant (ref projects/StreamPETR streampetr_head.py
    PETRHeadDN): noised copies of the GT centers join the query set as
    `num_dn_groups` groups; a block-diagonal self-attention mask keeps
    the matching queries and every noise group mutually isolated; the
    denoise slots are trained with KNOWN correspondence (no matching)."""
    num_dn_groups: int = 2
    dn_noise_scale: float = 0.1

    @nn.compact
    def __call__(self, img_feats, cam_params, image_size=(256, 704),
                 memory=None, dn=None, train: bool = False):
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
        n_match = self.num_query
        if memory is not None:
            mfeat = memory['feat'].astype(kv.dtype) \
                * memory['valid'][..., None]
            ref_b = jnp.concatenate([ref_b, memory['ref']], 1)
            q = jnp.concatenate([q, mfeat], 1)
            n_match += memory['feat'].shape[1]
        n_dn = 0
        if dn is not None:
            ref_b = jnp.concatenate([ref_b, dn['ref']], 1)
            q = jnp.concatenate(
                [q, jnp.zeros((B, dn['ref'].shape[1], self.embed_dims),
                              kv.dtype)], 1)
            n_dn = dn['ref'].shape[1]
        q_pos = nn.Dense(self.embed_dims, name='query_pos_fc1')(ref_b)
        q_pos = nn.relu(q_pos)
        q_pos = nn.Dense(self.embed_dims, name='query_pos_fc2')(q_pos)

        # block mask: matching block + per-group dn blocks, no cross talk
        Q = n_match + n_dn
        mask = np.zeros((Q, Q), bool)
        mask[:n_match, :n_match] = True
        if n_dn:
            g = n_dn // max(self.num_dn_groups, 1)
            for gi in range(self.num_dn_groups):
                s = n_match + gi * g
                e = n_match + ((gi + 1) * g if gi < self.num_dn_groups - 1
                               else n_dn)
                mask[s:e, s:e] = True
        mask_j = jnp.asarray(mask)

        from ..dense_heads.petr_head import PETRDecoderLayer
        code = 10 if self.with_velocity else 8
        all_cls, all_bbox = [], []
        for li in range(self.num_layers):
            q = PETRDecoderLayer(self.embed_dims, self.nhead,
                                 name=f'layer_{li}')(
                q, kv, q_pos, k_pos, self_attn_mask=mask_j)
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
        return dict(all_cls=jnp.stack(all_cls)[:, :, :n_match],
                    all_bbox=jnp.stack(all_bbox)[:, :, :n_match],
                    dn_cls=jnp.stack(all_cls)[:, :, n_match:],
                    dn_bbox=jnp.stack(all_bbox)[:, :, n_match:],
                    reference=ref_b[:, :n_match],
                    query_feat=q[:, :n_match])

    def make_dn(self, rng, gt_bboxes, gt_mask):
        """Noised GT references, tiled into groups. → dn dict + targets."""
        pr = jnp.asarray(self.pc_range)
        ctr01 = (gt_bboxes[..., :3] - pr[:3]) / (pr[3:] - pr[:3])
        G = gt_bboxes.shape[1]
        refs, valids = [], []
        for gi in range(self.num_dn_groups):
            noise = jax.random.uniform(
                jax.random.fold_in(rng, gi), ctr01.shape,
                minval=-self.dn_noise_scale, maxval=self.dn_noise_scale)
            refs.append(jnp.clip(ctr01 + noise, 0, 1))
            valids.append(gt_mask)
        return dict(ref=jnp.concatenate(refs, 1),
                    valid=jnp.concatenate(valids, 1))

    def dn_loss(self, outs, gt_bboxes, gt_labels, gt_mask):
        """Known-correspondence denoise loss over all layers/groups."""
        from ..losses.losses import l1_loss, sigmoid_focal_loss
        pr = jnp.asarray(self.pc_range)
        G = gt_bboxes.shape[1]
        ctr01 = (gt_bboxes[..., :3] - pr[:3]) / (pr[3:] - pr[:3])
        tgt_parts = [ctr01, jnp.log(jnp.maximum(gt_bboxes[..., 3:6],
                                                1e-3)),
                     jnp.sin(gt_bboxes[..., 6:7]),
                     jnp.cos(gt_bboxes[..., 6:7])]
        if self.with_velocity and gt_bboxes.shape[-1] > 8:
            tgt_parts.append(gt_bboxes[..., 7:9])
        tgt = jnp.concatenate(tgt_parts, -1)
        tgt = jnp.tile(tgt, (1, self.num_dn_groups, 1))
        lbl = jnp.tile(jnp.clip(gt_labels, 0), (1, self.num_dn_groups))
        msk = jnp.tile(gt_mask, (1, self.num_dn_groups))
        L = outs['dn_cls'].shape[0]
        total_cls = total_bbox = 0.0
        for li in range(L):
            cls = outs['dn_cls'][li]
            box = outs['dn_bbox'][li]
            onehot = jax.nn.one_hot(lbl, self.num_classes)
            n = jnp.maximum(jnp.sum(msk), 1.0)
            total_cls += jnp.sum(sigmoid_focal_loss(cls, onehot)
                                 * msk[..., None]) / n
            pred = jnp.concatenate(
                [box[..., :3], box[..., 3:6],
                 jnp.sin(jnp.arctan2(box[..., 6:7], box[..., 7:8])),
                 jnp.cos(jnp.arctan2(box[..., 6:7], box[..., 7:8]))]
                + ([box[..., 8:10]] if self.with_velocity
                   and box.shape[-1] > 8 else []), -1)
            total_bbox += jnp.sum(
                l1_loss(pred[..., :tgt.shape[-1]], tgt)
                * msk[..., None]) / n
        return dict(loss_dn_cls=total_cls / L,
                    loss_dn_bbox=total_bbox / L)


@MODELS.register_module()
class FocalHead(nn.Module):
    """2D auxiliary prior head (ref projects/StreamPETR focal_head.py):
    per-pixel class logits + centerness over the image features; the
    top-k pixels, lifted along their rays at a predicted depth, become
    extra 3D query reference points. Trained with a projected-GT-center
    heatmap focal loss + depth L1."""
    num_classes: int = 10
    in_channels: int = 256
    num_priors: int = 64
    pc_range: Any = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

    @nn.compact
    def __call__(self, img_feats, cam_params, image_size=(256, 704),
                 train: bool = False):
        """→ (prior_refs [B, num_priors, 3] in [0,1], aux dict)."""
        B, N, fH, fW, C = img_feats.shape
        x = img_feats.reshape(B * N, fH, fW, C)
        h = nn.Conv(C, (3, 3), padding='SAME', name='conv')(x)
        h = nn.relu(h)
        cls = nn.Conv(self.num_classes, (1, 1), name='cls')(h)
        ctr = nn.Conv(1, (1, 1), name='ctr')(h)
        depth = nn.Conv(1, (1, 1), name='depth')(h)
        score = (jax.nn.sigmoid(cls).max(-1)
                 * jax.nn.sigmoid(ctr[..., 0])).reshape(B, N * fH * fW)
        top, idx = jax.lax.top_k(score, self.num_priors)
        iH, iW = image_size
        # pixel rays → 3D at the predicted depth
        us = jnp.linspace(0, iW - 1, fW)
        vs = jnp.linspace(0, iH - 1, fH)
        gv, gu = jnp.meshgrid(vs, us, indexing='ij')
        uflat = jnp.broadcast_to(gu[None], (N, fH, fW)).reshape(-1)
        vflat = jnp.broadcast_to(gv[None], (N, fH, fW)).reshape(-1)
        cam_of = jnp.repeat(jnp.arange(N), fH * fW)
        d = jax.nn.softplus(depth).reshape(B, N * fH * fW)

        def lift(idx_b, d_b, c2l, K):
            u = uflat[idx_b]; v = vflat[idx_b]
            cam = cam_of[idx_b]
            dep = jnp.take_along_axis(d_b, idx_b, 0)
            Kc = K[cam]
            fx, fy = Kc[:, 0, 0], Kc[:, 1, 1]
            cx, cy = Kc[:, 0, 2], Kc[:, 1, 2]
            pc = jnp.stack([(u - cx) / fx * dep, (v - cy) / fy * dep,
                            dep], -1)
            R = c2l[cam][:, :3, :3]
            t = c2l[cam][:, :3, 3]
            return jnp.einsum('mij,mj->mi', R, pc) + t

        world = jax.vmap(lift)(idx, d, cam_params['cam2lidar'],
                               cam_params['intrins'])
        pr = jnp.asarray(self.pc_range)
        refs = jnp.clip((world - pr[:3]) / (pr[3:] - pr[:3]), 0, 1)
        return refs, dict(cls=cls.reshape(B, N, fH, fW, -1),
                          ctr=ctr.reshape(B, N, fH, fW),
                          depth=d.reshape(B, N, fH, fW))


@MODELS.register_module()
class EVAViT(nn.Module):
    """EVA-style plain ViT backbone (ref projects/StreamPETR
    models/backbones/eva_vit.py:862). Compact rebuild: patch embed +
    pre-norm blocks, global attention every `global_interval`-th block
    and windowed attention elsewhere (the EVA02 scheme); learned 2D
    positional embeddings (the reference's RoPE is intentionally replaced
    — documented deviation)."""
    img_size: Any = (256, 704)
    patch_size: int = 16
    embed_dims: int = 384
    depth: int = 6
    num_heads: int = 6
    mlp_ratio: float = 4.0
    window_size: int = 4
    global_interval: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        p = self.patch_size
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    padding='VALID', name='patch_embed')(x)
        _, h, w, C = x.shape
        pos = self.param('pos_embed', nn.initializers.normal(0.02),
                         (h, w, C))
        x = x + pos[None]
        for i in range(self.depth):
            is_global = (i + 1) % self.global_interval == 0
            y = nn.LayerNorm(name=f'norm1_{i}')(x)
            if is_global:
                t = y.reshape(B, h * w, C)
                t = nn.MultiHeadDotProductAttention(
                    self.num_heads, name=f'attn_{i}')(t, t)
                x = x + t.reshape(B, h, w, C)
            else:
                ws = self.window_size
                ph, pw = (-h) % ws, (-w) % ws
                yp = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
                hh, ww = yp.shape[1:3]
                t = yp.reshape(B, hh // ws, ws, ww // ws, ws, C) \
                    .transpose(0, 1, 3, 2, 4, 5) \
                    .reshape(-1, ws * ws, C)
                t = nn.MultiHeadDotProductAttention(
                    self.num_heads, name=f'attn_{i}')(t, t)
                t = t.reshape(B, hh // ws, ww // ws, ws, ws, C) \
                    .transpose(0, 1, 3, 2, 4, 5).reshape(B, hh, ww, C)
                x = x + t[:, :h, :w]
            y = nn.LayerNorm(name=f'norm2_{i}')(x)
            y = nn.Dense(int(C * self.mlp_ratio), name=f'fc1_{i}')(y)
            y = nn.gelu(y)
            y = nn.Dense(C, name=f'fc2_{i}')(y)
            x = x + y
        return (nn.LayerNorm(name='norm_out')(x),)
