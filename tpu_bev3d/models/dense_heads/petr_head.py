"""PETR head: camera-only DETR-style 3D detection.

Ref: projects/PETR/petr/petr_head.py:47 (PETRHead — 3D coordinate position
embedding from camera frustums, learned 3D reference-point queries, DETR
decoder, per-layer cls/reg branches, NMS-free decode petr/nms_free_coder.py:19)
and petr_transformer.py:27-493.

TPU design: all cameras' feature tokens are flattened into one [B, N·H·W, C]
key sequence; the 3D position encoding is computed from the same frustum
unprojection machinery as the LSS transform (fp32); the decoder is plain
flax MultiHeadDotProductAttention stacks — every matmul lands on the MXU.
Training matches queries to padded GT with the same on-device greedy
assignment as the TransFusion head.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS
from ..losses.losses import l1_loss, sigmoid_focal_loss
from .transfusion_head import greedy_assign


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class PETRDecoderLayer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    dim_ff: int = 2048

    @nn.compact
    def __call__(self, q, kv, q_pos, k_pos, self_attn_mask=None):
        """self_attn_mask [Q, Q] bool (True = may attend) — used by the
        denoising head to isolate noise groups (ref PETRHeadDN)."""
        mask = None if self_attn_mask is None else \
            self_attn_mask[None, None]
        x = q + nn.MultiHeadDotProductAttention(
            self.nhead, dtype=q.dtype, name='self_attn')(q + q_pos, q + q_pos,
                                                         q, mask=mask)
        x = nn.LayerNorm(dtype=x.dtype)(x)
        x = x + nn.MultiHeadDotProductAttention(
            self.nhead, dtype=x.dtype, name='cross_attn')(
                x + q_pos, kv + k_pos, kv)
        x = nn.LayerNorm(dtype=x.dtype)(x)
        y = nn.Dense(self.dim_ff, dtype=x.dtype)(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=y.dtype)(y)
        return nn.LayerNorm(dtype=x.dtype)(x + y)


@MODELS.register_module()
class PETRHead(nn.Module):
    """Config surface mirrors ref petr_head.py:47-200."""
    num_classes: int = 10
    in_channels: int = 256
    embed_dims: int = 256
    num_query: int = 900
    num_layers: int = 6
    nhead: int = 8
    depth_num: int = 64
    position_range: Sequence[float] = (-61.2, -61.2, -10.0, 61.2, 61.2,
                                       10.0)
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    with_velocity: bool = True
    code_weights: Sequence[float] = (1., 1., 1., 1., 1., 1., 1., 1.,
                                     0.2, 0.2)
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 0.25
    max_num: int = 300

    def _position_encoding_3d(self, feats_shape, cam_params, image_size):
        """Frustum-unprojection 3D PE (ref petr_head.py position_embedding):
        D points per pixel along the ray → normalized [0,1]³ coords → MLP.
        Returns [B, N·H·W, embed] (computed in fp32)."""
        B, N, fH, fW, _ = feats_shape
        iH, iW = image_size
        D = self.depth_num
        # depth bins (LID-style spacing, ref petr_head)
        index = np.arange(D, dtype=np.float32)
        bin_size = (self.position_range[3] - 1.0) / (D * (1 + D)) * 2
        ds = 1.0 + bin_size * index * (index + 1) / 2           # [D]
        us = np.linspace(0, iW - 1, fW, dtype=np.float32)
        vs = np.linspace(0, iH - 1, fH, dtype=np.float32)
        g_v, g_u = np.meshgrid(vs, us, indexing='ij')           # [fH, fW]
        frustum = np.stack(
            [np.broadcast_to(g_u, (D, fH, fW)),
             np.broadcast_to(g_v, (D, fH, fW)),
             np.broadcast_to(ds[:, None, None], (D, fH, fW))], -1)
        frustum = jnp.asarray(frustum)                          # [D,fH,fW,3]
        pts = jnp.concatenate(
            [frustum[..., :2] * frustum[..., 2:3], frustum[..., 2:3]], -1)
        combine = jnp.einsum(
            'bnij,bnjk->bnik', cam_params['cam2lidar'][..., :3, :3],
            jnp.linalg.inv(cam_params['intrins']))
        world = jnp.einsum('bnij,dhwj->bndhwi', combine, pts) \
            + cam_params['cam2lidar'][:, :, None, None, None, :3, 3]
        pr = jnp.asarray(self.position_range)
        norm = (world - pr[:3]) / (pr[3:] - pr[:3])
        norm = jnp.clip(norm, 0.0, 1.0)
        # [B,N,D,fH,fW,3] → [B, N·fH·fW, D*3]
        x = jnp.transpose(norm, (0, 1, 3, 4, 2, 5)).reshape(
            B, N * fH * fW, D * 3)
        h = nn.Dense(self.embed_dims * 4, name='pe_fc1')(x)
        h = nn.relu(h)
        return nn.Dense(self.embed_dims, name='pe_fc2')(h)

    @nn.compact
    def __call__(self, img_feats, cam_params, image_size=(256, 704),
                 train: bool = False):
        """img_feats [B, N, fH, fW, C] (one level); cam_params with
        cam2lidar/intrins. → dict(all_cls [L,B,Q,K], all_bbox [L,B,Q,10],
        reference [B,Q,3])."""
        B, N, fH, fW, C = img_feats.shape
        kv = nn.Dense(self.embed_dims, name='input_proj')(
            img_feats.reshape(B, N * fH * fW, C))
        k_pos = self._position_encoding_3d(
            img_feats.shape, cam_params, image_size).astype(kv.dtype)

        ref = self.param('reference_points',
                         nn.initializers.uniform(scale=1.0),
                         (self.num_query, 3))                    # in [0,1]
        ref_b = jnp.broadcast_to(ref[None], (B,) + ref.shape)
        q_pos = nn.Dense(self.embed_dims, name='query_pos_fc1')(ref_b)
        q_pos = nn.relu(q_pos)
        q_pos = nn.Dense(self.embed_dims, name='query_pos_fc2')(q_pos)
        q = jnp.zeros((B, self.num_query, self.embed_dims), kv.dtype)

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
            # center relative to reference (ref petr_head: sigmoid-space)
            xyz = jax.nn.sigmoid(reg[..., :3] + inverse_sigmoid(ref_b))
            reg = jnp.concatenate([xyz, reg[..., 3:]], -1)
            all_cls.append(cls)
            all_bbox.append(reg)
        return dict(all_cls=jnp.stack(all_cls),
                    all_bbox=jnp.stack(all_bbox), reference=ref_b)

    # ------------------------------------------------------------ decode

    def _denorm_center(self, xyz01):
        pr = jnp.asarray(self.pc_range)
        return xyz01 * (pr[3:] - pr[:3]) + pr[:3]

    def decode_layer(self, cls_logits, bbox_pred):
        """→ boxes [B,Q,7/9] (x,y,z,dx,dy,dz,yaw,vx,vy), scores, labels.
        Ref NMSFreeCoder (nms_free_coder.py:19): no NMS, top-k by score."""
        ctr = self._denorm_center(bbox_pred[..., :3])
        dims = jnp.exp(jnp.clip(bbox_pred[..., 3:6], -5, 5))
        yaw = jnp.arctan2(bbox_pred[..., 6:7], bbox_pred[..., 7:8])
        parts = [ctr, dims, yaw]
        if self.with_velocity:
            parts.append(bbox_pred[..., 8:10])
        boxes = jnp.concatenate(parts, -1)
        scores = jax.nn.sigmoid(cls_logits)                     # [B,Q,K]
        B, Q, K = scores.shape
        flat = scores.reshape(B, Q * K)
        top, idx = jax.lax.top_k(flat, min(self.max_num, Q * K))
        qi = idx // K
        labels = idx % K
        sel = jax.vmap(lambda b, i: b[i])(boxes, qi)
        return dict(bboxes=sel, scores=top, labels=labels,
                    mask=top > 0.0)

    def predict_by_feat(self, outs):
        return self.decode_layer(outs['all_cls'][-1], outs['all_bbox'][-1])

    # ------------------------------------------------------------ training

    def _encode_gt(self, gtb):
        pr = jnp.asarray(self.pc_range)
        xyz01 = (gtb[..., :3] - pr[:3]) / (pr[3:] - pr[:3])
        parts = [xyz01, jnp.log(jnp.maximum(gtb[..., 3:6], 1e-4)),
                 jnp.sin(gtb[..., 6:7]), jnp.cos(gtb[..., 6:7])]
        if self.with_velocity:
            parts.append(gtb[..., 7:9])
        return jnp.concatenate(parts, -1)

    def loss_by_feat(self, outs, gt_bboxes, gt_labels, gt_mask):
        losses = {}
        L = outs['all_cls'].shape[0]
        for li in range(L):
            cls = outs['all_cls'][li]
            reg = outs['all_bbox'][li]

            def one(cls_s, reg_s, gtb, gtl, gtm):
                p = jax.nn.sigmoid(cls_s)                       # [Q,K]
                gl = jnp.clip(gtl, 0)
                pc = p[:, gl]                                   # [Q,G]
                cost_cls = -jnp.log(jnp.clip(pc, 1e-8)) * 0.25 \
                    * (1 - pc) ** 2 + jnp.log(
                        jnp.clip(1 - pc, 1e-8)) * 0.75 * pc ** 2
                tgt = self._encode_gt(gtb)                      # [G,code]
                cost_reg = jnp.sum(
                    jnp.abs(reg_s[:, None, :3] - tgt[None, :, :3]), -1)
                cost = cost_cls + cost_reg
                qgt = greedy_assign(cost, gtm)
                pos = qgt >= 0
                agt = jnp.clip(qgt, 0)
                labels = jnp.where(pos, gtl[agt], self.num_classes)
                onehot = jax.nn.one_hot(labels, self.num_classes)
                npos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
                l_cls = jnp.sum(sigmoid_focal_loss(cls_s, onehot)) / npos
                cw = jnp.asarray(self.code_weights[:reg_s.shape[-1]])
                l_reg = jnp.sum(
                    l1_loss(reg_s, tgt[agt]) * cw
                    * pos[:, None].astype(reg_s.dtype)) / npos
                return l_cls, l_reg

            l_cls, l_reg = jax.vmap(one)(cls, reg, gt_bboxes, gt_labels,
                                         gt_mask)
            sfx = '' if li == L - 1 else f'.d{li}'
            losses[f'loss_cls{sfx}'] = \
                self.loss_cls_weight * jnp.mean(l_cls)
            losses[f'loss_bbox{sfx}'] = \
                self.loss_bbox_weight * jnp.mean(l_reg)
        return losses
