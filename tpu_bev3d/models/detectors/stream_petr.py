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
    img_roi_head: Any = None      # aux 2D head (YOLOXHead2D / FocalHead)
    aux_2d_only: bool = True      # ref petr3d.py:61 — 2D head train-only
    image_size: Any = (256, 704)
    num_propagated: int = 128

    def setup(self):
        self._img_backbone = MODELS.build(dict(self.img_backbone))
        self._img_neck = MODELS.build(dict(self.img_neck)) \
            if self.img_neck else None
        head_cfg = dict(self.bbox_head)
        head_cfg['num_memory'] = self.num_propagated
        self._bbox_head = MODELS.build(head_cfg)
        self._img_roi_head = MODELS.build(dict(self.img_roi_head)) \
            if self.img_roi_head else None

    def empty_memory(self, batch_size: int):
        """Fixed-size temporal memory pytree. The extra velo/timestamp/
        egopose slots feed SparseHead's MLN ego conditioning (ref
        sparse_head.py:403-468 pre/post_update_memory); heads that don't
        use them (StreamPETRHead) simply ignore the keys."""
        d = self._bbox_head.embed_dims
        M = self.num_propagated
        return dict(
            feat=jnp.zeros((batch_size, M, d)),
            ref=jnp.full((batch_size, M, 3), 0.5),
            valid=jnp.zeros((batch_size, M), bool),
            velo=jnp.zeros((batch_size, M, 3)),
            timestamp=jnp.zeros((batch_size, M, 1)),
            egopose=jnp.tile(jnp.eye(4), (batch_size, M, 1, 1)))

    def extract_feat(self, imgs, train=False):
        B, N, H, W, C = imgs.shape
        x = imgs.reshape(B * N, H, W, C)
        feats = self._img_backbone(x, train=train)
        if self._img_neck is not None:
            feats = self._img_neck(feats, train=train)
        f = feats[0]
        fh, fw, fc = f.shape[1:]
        return f.reshape(B, N, fh, fw, fc), feats

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
            if 'egopose' in memory:
                memory = dict(memory, egopose=jnp.einsum(
                    'bij,bmjk->bmik', T, memory['egopose']))
        if 'time_delta' in batch and 'timestamp' in memory:
            # propagated queries age by dt each frame (ref
            # sparse_head.py:403-435 memory_timestamp += time interval)
            memory = dict(memory, timestamp=memory['timestamp']
                          + batch['time_delta'][:, None, None])
        feats, feats_all = self.extract_feat(batch['imgs'], train=train)
        cam_params = {k: batch[k] for k in ('cam2lidar', 'intrins')
                      if k in batch}
        head_kwargs = {}
        outs2d = None
        if self._img_roi_head is not None:
            if isinstance(self._img_roi_head, FocalHead):
                prior_refs, _ = self._img_roi_head(
                    feats, cam_params, image_size=tuple(self.image_size),
                    train=train)
                head_kwargs['prior_refs'] = prior_refs
            elif (train or self.is_initializing()
                  or not self.aux_2d_only):
                # ref petr3d.py:172 — with aux_2d_only the 2D head is
                # training-time supervision only; eval skips it
                n_lvl = len(self._img_roi_head.strides)
                outs2d = self._img_roi_head(list(feats_all)[:n_lvl],
                                            train=train)
        outs = self._bbox_head(feats, cam_params,
                               image_size=tuple(self.image_size),
                               memory=memory, train=train, **head_kwargs)
        # build next-frame memory: top-k confident queries
        scores = jax.nn.sigmoid(outs['all_cls'][-1]).max(-1)   # [B, Q]
        top, idx = jax.lax.top_k(scores, self.num_propagated)
        gather = jax.vmap(lambda q, i: q[i])
        bbox_last = outs['all_bbox'][-1]
        velo = (jnp.concatenate(
            [bbox_last[..., 8:10],
             jnp.zeros_like(bbox_last[..., :1])], -1)
            if bbox_last.shape[-1] > 8 else
            jnp.zeros(bbox_last.shape[:-1] + (3,)))
        new_memory = dict(
            feat=gather(outs['query_feat'], idx),
            ref=gather(bbox_last[..., :3], idx),
            valid=top > 0.1,
            velo=gather(velo, idx),
            timestamp=jnp.zeros((B, self.num_propagated, 1)),
            egopose=jnp.tile(jnp.eye(4), (B, self.num_propagated, 1, 1)))
        if mode == 'tensor':
            return outs, new_memory
        if mode == 'loss':
            losses = self._bbox_head.loss_by_feat(
                outs, batch['gt_bboxes_3d'], batch['gt_labels_3d'],
                batch['gt_mask'])
            losses.update(self._aux_2d_losses(outs2d, batch))
            return losses, new_memory
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(outs), new_memory
        raise ValueError(mode)

    def _aux_2d_losses(self, outs2d, batch):
        """Aux 2D YOLOX losses over per-camera neck levels (ref
        petr3d.py:215-220 — only when 2D GT present)."""
        if outs2d is None or 'gt_bboxes_2d' not in batch:
            return {}
        B, N = batch['gt_bboxes_2d'].shape[:2]
        flat = lambda x: x.reshape((B * N,) + x.shape[2:])
        return self._img_roi_head.loss_by_feat(
            outs2d, flat(batch['gt_bboxes_2d']),
            flat(batch['gt_labels_2d']), flat(batch['centers2d']),
            flat(batch['gt_mask_2d']))


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


def pos2posemb3d(pos, num_pos_feats=128, temperature=10000.0):
    """Sin/cos embedding of normalized 3D points -> [..., 3*num_pos_feats]
    (ref projects/StreamPETR .../utils/positional_encoding.py:16-29;
    channel order y, x, z as the reference concatenates)."""
    scale = 2 * np.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    def enc(p):
        v = p[..., None] / dim_t
        return jnp.stack([jnp.sin(v[..., 0::2]), jnp.cos(v[..., 1::2])],
                         -1).reshape(v.shape[:-1] + (-1,))
    return jnp.concatenate([enc(pos[..., 1]), enc(pos[..., 0]),
                            enc(pos[..., 2])], -1)


def pos2posemb1d(pos, num_pos_feats=256, temperature=10000.0):
    """Ref positional_encoding.py:31-41."""
    scale = 2 * np.pi
    v = pos * scale / (temperature ** (
        2 * (jnp.arange(num_pos_feats, dtype=jnp.float32) // 2)
        / num_pos_feats))
    return jnp.concatenate([jnp.sin(v[..., 0::2]), jnp.cos(v[..., 1::2])],
                           -1)


def nerf_positional_encoding(x, num_encoding_functions=6):
    """NeRF frequency encoding (ref positional_encoding.py:43-76,
    log-sampled bands, input excluded)."""
    bands = 2.0 ** jnp.linspace(0.0, num_encoding_functions - 1,
                                num_encoding_functions)
    v = x[..., None] * bands                               # [..., D, F]
    out = jnp.stack([jnp.sin(v), jnp.cos(v)], -1)
    return out.reshape(x.shape[:-1] + (-1,))


class MLN(nn.Module):
    """Motion-aware LayerNorm: affine-free LN then FiLM-style gamma/beta
    predicted from a condition code (ref sparse_head.py:946-983; gamma
    initialized to ones via zero weight + ones bias)."""
    f_dim: int = 256

    @nn.compact
    def __call__(self, x, c):
        x = nn.LayerNorm(use_bias=False, use_scale=False)(x)
        c = nn.relu(nn.Dense(self.f_dim, name='reduce')(c))
        gamma = nn.Dense(self.f_dim, name='gamma',
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones)(c)
        beta = nn.Dense(self.f_dim, name='beta',
                        kernel_init=nn.initializers.zeros)(c)
        return gamma * x + beta


@MODELS.register_module()
class SparseHead(nn.Module):
    """Fully-sparse StreamPETR decoder head (ref projects/StreamPETR
    stream_petr/models/dense_heads/sparse_head.py:29 — the RepDETR3D
    head): queries embedded with sin/cos pos2posemb3d, temporal memory
    aligned via MLN conditioning on (velocity, timestamp, ego-pose) NeRF
    codes (ref temporal_alignment:244-287), a time embedding separating
    current from propagated queries, and optional 2D-prior reference
    points from an auxiliary image head (the repdetr3d.py:169-175 flow
    where YOLOX/Focal 2D centers seed 3D queries).

    TPU design: memory is a fixed-size pytree (feat/ref/velo/timestamp/
    egopose/valid) so one frame step is a single jittable function; the
    decoder cross-attends dense image tokens exactly like PETRHead
    (the reference's flash/deformable options collapse to one fused MXU
    attention here).
    """
    num_classes: int = 10
    embed_dims: int = 256
    num_query: int = 256
    num_layers: int = 3
    nhead: int = 8
    depth_num: int = 64
    num_memory: int = 128
    num_priors: int = 0
    with_velocity: bool = True
    position_range: Any = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    pc_range: Any = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    image_size: Any = (256, 704)
    code_weights: Any = (1., 1., 1., 1., 1., 1., 1., 1., 0.2, 0.2)
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 0.25
    max_num: int = 300

    def _heads(self, q, ref_b, li):
        h = nn.LayerNorm(name=f'post_norm_{li}')(q)
        cls = nn.Dense(self.num_classes, name=f'cls_{li}')(
            nn.relu(nn.Dense(self.embed_dims, name=f'cls_fc_{li}')(h)))
        code = 10 if self.with_velocity else 8
        reg = nn.Dense(code, name=f'reg_{li}')(
            nn.relu(nn.Dense(self.embed_dims, name=f'reg_fc_{li}')(h)))
        xyz = jax.nn.sigmoid(reg[..., :3] + inverse_sigmoid(ref_b))
        return cls, jnp.concatenate([xyz, reg[..., 3:]], -1)

    @nn.compact
    def __call__(self, img_feats, cam_params, image_size=None,
                 memory=None, prior_refs=None, train: bool = False):
        from ..dense_heads.petr_head import PETRDecoderLayer, PETRHead
        image_size = tuple(image_size or self.image_size)
        B, N, fH, fW, C = img_feats.shape
        kv = nn.Dense(self.embed_dims, name='input_proj')(
            img_feats.reshape(B, N * fH * fW, C))
        k_pos = PETRHead._position_encoding_3d(
            self, img_feats.shape, cam_params, image_size).astype(kv.dtype)

        ref = self.param('reference_points',
                         nn.initializers.uniform(scale=1.0),
                         (self.num_query, 3))
        ref_b = jnp.broadcast_to(ref[None], (B,) + ref.shape)
        if prior_refs is not None:
            ref_b = jnp.concatenate([ref_b, prior_refs], 1)
        n_cur = ref_b.shape[1]
        q = jnp.zeros((B, n_cur, self.embed_dims), kv.dtype)

        qe1 = nn.Dense(self.embed_dims, name='query_emb_fc1')
        qe2 = nn.Dense(self.embed_dims, name='query_emb_fc2')

        def query_embed(r):
            return qe2(nn.relu(qe1(pos2posemb3d(r).astype(kv.dtype))))

        q_pos = query_embed(ref_b)
        # current-frame ego code: zero motion + identity rotation
        # (ref temporal_alignment:256-262)
        eye = jnp.broadcast_to(jnp.eye(4)[:3, :].reshape(-1),
                               (B, n_cur, 12))
        cur_code = nerf_positional_encoding(
            jnp.concatenate([jnp.zeros((B, n_cur, 3)), eye], -1)
        ).astype(kv.dtype)
        ego_pose_memory = MLN(self.embed_dims, name='ego_pose_memory')
        ego_pose_pe = MLN(self.embed_dims, name='ego_pose_pe')
        q = ego_pose_memory(q, cur_code)
        q_pos = ego_pose_pe(q_pos, cur_code)

        te1 = nn.Dense(self.embed_dims, name='time_emb_fc1')
        te2 = nn.Dense(self.embed_dims, name='time_emb_fc2')

        def time_embed(t):
            return te2(nn.relu(te1(pos2posemb1d(t).astype(kv.dtype))))

        q_pos = q_pos + time_embed(jnp.zeros((B, n_cur, 1)))
        if memory is not None:
            mvalid = memory['valid'][..., None]
            mref = memory['ref']
            m_pos = query_embed(mref)
            # 2-dim velocity + timestamp + 12 pose = 15 dims, matching the
            # current-frame code (3 zeros + 12 pose) so the MLN modules
            # are shared (ref temporal_alignment:256-268)
            m_code = nerf_positional_encoding(jnp.concatenate(
                [memory['velo'][..., :2], memory['timestamp'],
                 memory['egopose'][..., :3, :].reshape(
                     memory['egopose'].shape[:-2] + (12,))],
                -1)).astype(kv.dtype)
            mfeat = ego_pose_memory(memory['feat'].astype(kv.dtype),
                                    m_code) * mvalid
            m_pos = (ego_pose_pe(m_pos, m_code)
                     + time_embed(memory['timestamp'])) * mvalid
            q = jnp.concatenate([q, mfeat], 1)
            q_pos = jnp.concatenate([q_pos, m_pos], 1)
            ref_b = jnp.concatenate([ref_b, mref], 1)

        all_cls, all_bbox = [], []
        for li in range(self.num_layers):
            q = PETRDecoderLayer(self.embed_dims, self.nhead,
                                 name=f'layer_{li}')(q, kv, q_pos, k_pos)
            cls, reg = self._heads(q, ref_b, li)
            all_cls.append(cls)
            all_bbox.append(reg)
        return dict(all_cls=jnp.stack(all_cls),
                    all_bbox=jnp.stack(all_bbox), reference=ref_b,
                    query_feat=q)

    # loss/predict: delegate to the PETRHead implementations (same
    # normalized box parameterization)
    loss_by_feat = PETRHead.loss_by_feat
    predict_by_feat = PETRHead.predict_by_feat
    decode_layer = PETRHead.decode_layer
    _denorm_center = PETRHead._denorm_center
    _encode_gt = PETRHead._encode_gt


def rope_2d_tables(h, w, dim_head, pt_seq_len=16, theta=10000.0):
    """Axial 2D rotary tables (ref eva_vit.py VisionRotaryEmbeddingFast
    :283-350): half the head dim rotates with the row position, half with
    the column; 'lang' frequency schedule with pixel-normalized t.
    → (cos [h, w, dim_head], sin [h, w, dim_head])."""
    half = dim_head // 2
    freqs = 1.0 / (theta ** (np.arange(0, half, 2, dtype=np.float32)
                             / half))                       # [half/2]

    def axis(n):
        t = np.arange(n, dtype=np.float32) / n * pt_seq_len
        f = np.outer(t, freqs)                              # [n, half/2]
        return np.repeat(f, 2, axis=-1)                     # [n, half]

    fh, fw = axis(h), axis(w)
    grid = np.concatenate(
        [np.broadcast_to(fh[:, None, :], (h, w, half)),
         np.broadcast_to(fw[None, :, :], (h, w, half))], -1)
    return jnp.asarray(np.cos(grid)), jnp.asarray(np.sin(grid))


def apply_rope(x, cos, sin):
    """x [..., h, w, heads, d]; cos/sin [h, w, d] — rotate-pairs RoPE
    (ref eva_vit rotate_half on interleaved pairs)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rot = jnp.stack([-x2, x1], -1).reshape(x.shape)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + rot * s


class _EVAAttention(nn.Module):
    """QKV on the 2D token grid, RoPE on q/k, then full-grid or windowed
    softmax attention. RoPE is per-token and therefore commutes with
    window partitioning — applied once at grid layout."""
    num_heads: int
    window_size: int = 0        # 0 → global attention

    @nn.compact
    def __call__(self, x, rope=None):
        B, h, w, C = x.shape
        nh = self.num_heads
        d = C // nh
        qkv = nn.Dense(3 * C, name='qkv')(x).reshape(B, h, w, 3, nh, d)
        q, k, v = (qkv[..., i, :, :] for i in range(3))
        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        def attend(qt, kt, vt):
            # [B', N, nh, d]
            a = jnp.einsum('bnhd,bmhd->bhnm', qt * (d ** -0.5), kt)
            a = jax.nn.softmax(a, axis=-1)
            return jnp.einsum('bhnm,bmhd->bnhd', a, vt)

        if self.window_size:
            ws = self.window_size
            ph, pw = (-h) % ws, (-w) % ws
            hh, ww = h + ph, w + pw

            def part(t):
                t = jnp.pad(t, ((0, 0), (0, ph), (0, pw), (0, 0),
                                (0, 0)))
                t = t.reshape(B, hh // ws, ws, ww // ws, ws, nh, d)
                return t.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
                    -1, ws * ws, nh, d)
            o = attend(part(q), part(k), part(v))
            o = o.reshape(B, hh // ws, ww // ws, ws, ws, nh, d) \
                .transpose(0, 1, 3, 2, 4, 5, 6).reshape(B, hh, ww, C)
            o = o[:, :h, :w]
        else:
            o = attend(q.reshape(B, h * w, nh, d),
                       k.reshape(B, h * w, nh, d),
                       v.reshape(B, h * w, nh, d)).reshape(B, h, w, C)
        return nn.Dense(C, name='proj')(o)


@MODELS.register_module()
class EVAViT(nn.Module):
    """EVA-style plain ViT backbone (ref projects/StreamPETR
    models/backbones/eva_vit.py:862). Patch embed + pre-norm blocks,
    global attention every `global_interval`-th block and windowed
    attention elsewhere (the EVA02 scheme); axial 2D RoPE on q/k like the
    reference's VisionRotaryEmbeddingFast (use_rope=False falls back to
    learned absolute embeddings)."""
    img_size: Any = (256, 704)
    patch_size: int = 16
    embed_dims: int = 384
    depth: int = 6
    num_heads: int = 6
    mlp_ratio: float = 4.0
    window_size: int = 4
    global_interval: int = 3
    use_rope: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        p = self.patch_size
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    padding='VALID', name='patch_embed')(x)
        _, h, w, C = x.shape
        rope = None
        if self.use_rope:
            rope = rope_2d_tables(h, w, C // self.num_heads)
        else:
            pos = self.param('pos_embed', nn.initializers.normal(0.02),
                             (h, w, C))
            x = x + pos[None]
        for i in range(self.depth):
            is_global = (i + 1) % self.global_interval == 0
            y = nn.LayerNorm(name=f'norm1_{i}')(x)
            x = x + _EVAAttention(
                self.num_heads,
                window_size=0 if is_global else self.window_size,
                name=f'attn_{i}')(y, rope=rope)
            y = nn.LayerNorm(name=f'norm2_{i}')(x)
            y = nn.Dense(int(C * self.mlp_ratio), name=f'fc1_{i}')(y)
            y = nn.gelu(y)
            y = nn.Dense(C, name=f'fc2_{i}')(y)
            x = x + y
        return (nn.LayerNorm(name='norm_out')(x),)
