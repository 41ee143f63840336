"""PointNet++ set-abstraction / feature-propagation modules.

Refs: mmdet3d/models/layers/pointnet_modules/point_sa_module.py
(PointSAModule(MSG) — FPS → ball query → group → shared MLP → max) and
point_fp_module.py (three_nn interpolation + unit MLP).

All fixed-shape: [P, 3] xyz + [P, C] feats + [P] mask per sample; batch
handled by vmap in the caller. The shared MLPs are Dense stacks over the
[S, K, C] group tensor — one [S·K, C]×[C, C'] MXU GEMM each.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.pointnet_ops import (ball_query, fps, grouping_operation,
                                 three_interpolate, three_nn)


class SharedMLP(nn.Module):
    """Dense + LayerNorm + ReLU stack.

    The reference uses BatchNorm here (point_sa_module.py ConvModule);
    LayerNorm is the TPU-native choice: it keeps the per-sample modules
    freely vmappable (no cross-batch mutable running stats) and is the
    standard modern substitution for BN in point networks.
    """
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, dtype=x.dtype,
                         name=f'fc{i}')(x)
            x = nn.LayerNorm(dtype=x.dtype, name=f'ln{i}')(x)
            x = nn.relu(x)
        return x


class PointSAModule(nn.Module):
    """Single-scale-group SA (ref point_sa_module.py PointSAModule)."""
    num_point: int
    radius: float
    num_sample: int
    mlp_channels: Sequence[int]
    use_xyz: bool = True
    fps_chunks: int = 1   # >1 → bucketed subsample-union FPS (TPU fast)
    ballq: str = ''       # '' env-default | 'exact' | 'approx' (TPU fast)

    @nn.compact
    def __call__(self, xyz, feats, mask, train: bool = False,
                 indices=None, target_xyz=None):
        """[P,3], [P,C] or None, [P] → (new_xyz [S,3], new_feats [S,C'],
        new_mask [S], fps_idx [S])."""
        if target_xyz is not None:
            new_xyz = target_xyz
            idx = None
            new_mask = jnp.ones(new_xyz.shape[0], bool)
        else:
            idx = indices if indices is not None else \
                fps(xyz, mask, self.num_point, self.fps_chunks)
            new_xyz = xyz[idx]
            new_mask = mask[idx]
        nidx, nvalid = ball_query(new_xyz, xyz, mask, self.radius,
                                  self.num_sample, method=self.ballq)
        grouped_xyz = grouping_operation(xyz, nidx) - new_xyz[:, None]
        if feats is not None:
            g = grouping_operation(feats, nidx)
            if self.use_xyz:
                g = jnp.concatenate([grouped_xyz, g], -1)
        else:
            g = grouped_xyz
        g = SharedMLP(self.mlp_channels, name='mlp')(g, nvalid, train)
        g = jnp.where(nvalid[..., None], g, -jnp.inf)
        out = jnp.max(g, axis=1)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        out = out * new_mask[:, None].astype(out.dtype)
        return new_xyz, out, new_mask, idx


class PointSAModuleMSG(nn.Module):
    """Multi-scale-grouping SA (ref point_sa_module.py PointSAModuleMSG):
    one FPS center set, several (radius, nsample, mlp) branches whose
    max-pooled features concatenate."""
    num_point: int
    radii: Sequence[float]
    num_samples: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]
    use_xyz: bool = True
    fps_chunks: int = 1
    ballq: str = ''

    @nn.compact
    def __call__(self, xyz, feats, mask, train: bool = False,
                 indices=None):
        idx = indices if indices is not None else \
            fps(xyz, mask, self.num_point, self.fps_chunks)
        new_xyz = xyz[idx]
        new_mask = mask[idx]
        outs = []
        for bi, (r, k, mlp) in enumerate(zip(self.radii, self.num_samples,
                                             self.mlp_channels)):
            nidx, nvalid = ball_query(new_xyz, xyz, mask, r, k,
                                      method=self.ballq)
            grouped_xyz = grouping_operation(xyz, nidx) - new_xyz[:, None]
            if feats is not None:
                g = grouping_operation(feats, nidx)
                if self.use_xyz:
                    g = jnp.concatenate([grouped_xyz, g], -1)
            else:
                g = grouped_xyz
            g = SharedMLP(tuple(mlp), name=f'mlp{bi}')(g, nvalid, train)
            g = jnp.where(nvalid[..., None], g, -jnp.inf)
            o = jnp.max(g, axis=1)
            o = jnp.where(jnp.isfinite(o), o, 0.0)
            outs.append(o)
        out = jnp.concatenate(outs, -1) * new_mask[:, None]
        return new_xyz, out, new_mask, idx


class PointFPModule(nn.Module):
    """Feature propagation (ref point_fp_module.py)."""
    mlp_channels: Sequence[int]

    @nn.compact
    def __call__(self, target_xyz, source_xyz, target_feats, source_feats,
                 source_mask, train: bool = False):
        dist, idx = three_nn(target_xyz, source_xyz, source_mask)
        interp = three_interpolate(source_feats, idx, dist)
        if target_feats is not None:
            interp = jnp.concatenate([interp, target_feats], -1)
        tmask = jnp.ones(target_xyz.shape[0], bool)
        return SharedMLP(self.mlp_channels, name='mlp')(
            interp, tmask, train)


class PAConv(nn.Module):
    """Position Adaptive Convolution (ref mmdet3d/models/layers/paconv/
    paconv.py): a bank of M weight matrices is mixed per neighbor by
    coefficients from a ScoreNet over the relative position; the mixed
    matmul is realized as (feat @ each W_m) weighted by scores — all
    MXU GEMMs, no per-neighbor dynamic weights."""
    out_channels: int
    num_kernels: int = 8
    scorenet_channels: int = 16

    @nn.compact
    def __call__(self, grouped_feats, grouped_xyz, valid):
        """grouped_feats [S, K, C]; grouped_xyz [S, K, 3] (center-rel);
        valid [S, K] → [S, K, out]."""
        M = self.num_kernels
        # ScoreNet over (rel xyz, |xyz|) → softmax over kernels
        d = jnp.linalg.norm(grouped_xyz, axis=-1, keepdims=True)
        s = jnp.concatenate([grouped_xyz, d], -1)
        s = nn.Dense(self.scorenet_channels, name='score_fc1')(s)
        s = nn.relu(s)
        scores = jax.nn.softmax(
            nn.Dense(M, name='score_fc2')(s), -1)          # [S, K, M]
        C = grouped_feats.shape[-1]
        bank = self.param('weight_bank', nn.initializers.lecun_normal(),
                          (M, C, self.out_channels))
        # [S,K,C] x [M,C,O] → [S,K,M,O], mixed by scores
        proj = jnp.einsum('skc,mco->skmo', grouped_feats, bank)
        out = jnp.einsum('skmo,skm->sko', proj, scores)
        return out * valid[..., None]

    @staticmethod
    def corr_loss(weight_bank):
        """Weight-bank correlation regularizer (ref paconv corr loss):
        penalize cosine similarity between kernel matrices."""
        M = weight_bank.shape[0]
        flat = weight_bank.reshape(M, -1)
        nrm = flat / jnp.maximum(
            jnp.linalg.norm(flat, axis=-1, keepdims=True), 1e-6)
        sim = nrm @ nrm.T
        off = sim - jnp.diag(jnp.diag(sim))
        return jnp.sum(off ** 2) / (M * (M - 1))


class PAConvSAModule(nn.Module):
    """SA module whose shared MLP is replaced by PAConv layers (ref
    paconv_sa_module.py)."""
    num_point: int
    radius: float
    num_sample: int
    mlp_channels: Sequence[int]
    num_kernels: int = 8
    fps_chunks: int = 1
    ballq: str = ''

    @nn.compact
    def __call__(self, xyz, feats, mask, train: bool = False):
        idx = fps(xyz, mask, self.num_point, self.fps_chunks)
        new_xyz = xyz[idx]
        new_mask = mask[idx]
        nidx, nvalid = ball_query(new_xyz, xyz, mask, self.radius,
                                  self.num_sample, method=self.ballq)
        g_xyz = grouping_operation(xyz, nidx) - new_xyz[:, None]
        g = g_xyz if feats is None else jnp.concatenate(
            [g_xyz, grouping_operation(feats, nidx)], -1)
        for i, ch in enumerate(self.mlp_channels):
            g = PAConv(ch, self.num_kernels, name=f'paconv{i}')(
                g, g_xyz, nvalid)
            g = nn.relu(g)
        g = jnp.where(nvalid[..., None], g, -jnp.inf)
        out = jnp.max(g, axis=1)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return new_xyz, out * new_mask[:, None], new_mask, idx
