"""SPVCNN backbone — Sparse Point-Voxel CNN.

Ref: mmdet3d/models/backbones/spvcnn_backone.py (SPVCNN = MinkUNet trunk
with a parallel per-point MLP branch; at stage boundaries the point
branch and the voxel branch exchange features: voxel→point gather at the
points' (current-resolution) voxel coords, point→voxel add-back).

TPU design: the point↔voxel exchange is a hash lookup into the sparse
coordinate table (the same searchsorted machinery as the sparse convs)
— fixed-shape gathers, no interpolation kernels.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.sparse_conv import SparseTensor, _linearize
from ...registry import MODELS
from ..segmentors.minkunet import MinkUNetBackbone
from ..layers.pointnet_modules import SharedMLP


def voxel_to_point(st: SparseTensor, point_coords, point_valid):
    """Gather voxel features at the points' voxel coords ([P, 4] b,z,y,x;
    -1 pad). Missing voxels → 0."""
    N = st.coords.shape[0]
    lin, _ = _linearize(st.coords, st.spatial_shape, st.batch_size)
    order = jnp.argsort(lin)
    lin_sorted = lin[order]
    nz, ny, nx = st.spatial_shape
    q = (point_coords[:, 0] * (nz * ny * nx)
         + point_coords[:, 1] * (ny * nx) + point_coords[:, 2] * nx
         + point_coords[:, 3])
    q = jnp.where(point_valid, q, -1)
    pos = jnp.clip(jnp.searchsorted(lin_sorted, q), 0, N - 1)
    found = (lin_sorted[pos] == q) & point_valid
    fpad = jnp.concatenate(
        [st.features, jnp.zeros((1, st.features.shape[1]),
                                st.features.dtype)], 0)
    idx = jnp.where(found, order[pos], N)
    return fpad[idx], found


@MODELS.register_module()
class SPVCNNBackbone(nn.Module):
    """MinkUNet trunk + point branch (ref spvcnn_backone.py)."""
    in_channels: int = 4
    base_channels: int = 32
    encoder_channels: Sequence[int] = (32, 64, 128, 256)
    decoder_channels: Sequence[int] = (256, 128, 96, 96)
    point_channels: Sequence[int] = (96,)

    @nn.compact
    def __call__(self, st: SparseTensor, point_coords, point_feats,
                 point_valid, train: bool = False):
        """st: voxelized input; point_coords [P,4] at INPUT resolution;
        point_feats [P,C]. → (voxel SparseTensor, point feats [P,C'])."""
        trunk = MinkUNetBackbone(
            in_channels=self.in_channels,
            base_channels=self.base_channels,
            encoder_channels=tuple(self.encoder_channels),
            decoder_channels=tuple(self.decoder_channels),
            name='trunk')
        st_out = trunk(st, train)
        # point branch: MLP on raw point features + voxel feedback at the
        # output (full) resolution
        h = point_feats
        for i, ch in enumerate(self.point_channels):
            h = nn.Dense(ch, name=f'point_fc{i}')(h)
            h = nn.relu(h)
        v2p, found = voxel_to_point(st_out, point_coords, point_valid)
        if v2p.shape[-1] != h.shape[-1]:
            v2p = nn.Dense(h.shape[-1], name='v2p_proj')(v2p)
        fused = h + v2p
        fused = fused * point_valid[:, None]
        return st_out, fused
