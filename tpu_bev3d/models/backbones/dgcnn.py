"""DGCNN backbone: dynamic graph edge convolutions.

Ref: mmdet3d/models/backbones/dgcnn.py — stacked EdgeConv blocks: per
point, KNN in feature space, MLP over (x_i, x_j − x_i), max over
neighbors; features of all blocks concatenate into the final per-point
descriptor (used for point-cloud segmentation).

TPU form: KNN = top-k over the full pairwise distance matrix (P ≤ ~8k for
seg configs — [P, P] is MXU-friendly); gathers are fixed-shape.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..layers.pointnet_modules import SharedMLP


def knn_graph(feats, mask, k: int):
    """[P, C], [P] → idx [P, k] nearest neighbors (excluding self)."""
    d2 = jnp.sum((feats[:, None] - feats[None]) ** 2, -1)
    d2 = jnp.where(mask[None], d2, jnp.inf)
    d2 = d2 + jnp.eye(feats.shape[0]) * 1e9     # exclude self
    _, idx = jax.lax.top_k(-d2, k)
    return idx


class EdgeConv(nn.Module):
    channels: Sequence[int]
    k: int = 16

    @nn.compact
    def __call__(self, feats, mask, train: bool = False):
        idx = knn_graph(feats, mask, self.k)
        nbr = feats[idx]                                  # [P, k, C]
        edge = jnp.concatenate(
            [jnp.broadcast_to(feats[:, None], nbr.shape), nbr - feats[:, None]],
            -1)
        h = SharedMLP(tuple(self.channels), name='mlp')(
            edge, jnp.ones(edge.shape[:2], bool), train)
        out = jnp.max(h, axis=1)
        return out * mask[:, None]


class _DGCNNSingle(nn.Module):
    edge_channels: Sequence[Sequence[int]]
    k: int
    out_channels: int

    @nn.compact
    def __call__(self, pts, mask, train: bool = False):
        x = pts
        feats_all = []
        for i, ch in enumerate(self.edge_channels):
            x = EdgeConv(tuple(ch), self.k, name=f'edge{i}')(x, mask, train)
            feats_all.append(x)
        cat = jnp.concatenate(feats_all, -1)
        out = SharedMLP((self.out_channels,), name='agg')(
            cat, mask, train)
        return dict(fp_xyz=pts[:, :3], fp_features=out, fp_mask=mask)


@MODELS.register_module()
class DGCNNBackbone(nn.Module):
    in_channels: int = 6
    edge_channels: Sequence[Sequence[int]] = ((64, 64), (64, 64), (64,))
    k: int = 16
    out_channels: int = 256

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        vm = nn.vmap(
            _DGCNNSingle, in_axes=(0, 0, None), out_axes=0,
            variable_axes={'params': None}, split_rngs={'params': False},
            methods=['__call__'])
        return vm(tuple(tuple(c) for c in self.edge_channels), self.k,
                  self.out_channels, name='net')(points, points_mask, train)
