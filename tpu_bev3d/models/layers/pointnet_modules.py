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

from ...ops.pointnet_ops import (ball_query, furthest_point_sample,
                                 grouping_operation, three_interpolate,
                                 three_nn)


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
                furthest_point_sample(xyz, mask, self.num_point)
            new_xyz = xyz[idx]
            new_mask = mask[idx]
        nidx, nvalid = ball_query(new_xyz, xyz, mask, self.radius,
                                  self.num_sample)
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

    @nn.compact
    def __call__(self, xyz, feats, mask, train: bool = False,
                 indices=None):
        idx = indices if indices is not None else \
            furthest_point_sample(xyz, mask, self.num_point)
        new_xyz = xyz[idx]
        new_mask = mask[idx]
        outs = []
        for bi, (r, k, mlp) in enumerate(zip(self.radii, self.num_samples,
                                             self.mlp_channels)):
            nidx, nvalid = ball_query(new_xyz, xyz, mask, r, k)
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
