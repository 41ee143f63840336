"""MinkUNet-style sparse 3D semantic segmentation.

Refs: mmdet3d/models/backbones/minkunet_backbone.py + segmentors/minkunet.py
(MinkowskiEngine/spconv/torchsparse backends) and the data_preprocessor's
'minkunet' voxelize mode (data_preprocessor.py:342-467).

TPU design: encoder = strided sparse convs over the fixed-capacity voxel
table; decoder = parent-gather upsampling (each fine voxel gathers its
stride-parent's feature — the TPU-native replacement for sparse inverse
conv) + SubM conv + skip concat. Per-point logits come from the
point→voxel index map produced by dynamic voxelization.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.sparse_conv import SparseTensor
from ...ops.voxelize import dynamic_scatter, dynamic_voxelize, grid_shape_of
from ...registry import MODELS
from ..losses.losses import softmax_cross_entropy
from ..middle_encoders.sparse_encoder import SparseConvLayer


def _parent_lookup(fine: SparseTensor, coarse: SparseTensor, stride=2):
    """For each fine voxel, row index of its stride-parent in coarse
    (missing → N)."""
    nz, ny, nx = coarse.spatial_shape
    N = coarse.coords.shape[0]
    parent = jnp.concatenate(
        [fine.coords[:, :1],
         jnp.floor_divide(fine.coords[:, 1:], stride)], -1)
    lin = (parent[:, 0] * (nz * ny * nx) + parent[:, 1] * (ny * nx)
           + parent[:, 2] * nx + parent[:, 3])
    clin = (coarse.coords[:, 0] * (nz * ny * nx)
            + coarse.coords[:, 1] * (ny * nx)
            + coarse.coords[:, 2] * nx + coarse.coords[:, 3])
    big = jnp.int32(coarse.batch_size * nz * ny * nx)
    clin = jnp.where(coarse.valid, clin, big)
    order = jnp.argsort(clin)
    pos = jnp.clip(jnp.searchsorted(clin[order], lin), 0, N - 1)
    found = (clin[order][pos] == lin) & fine.valid
    return jnp.where(found, order[pos], N)


@MODELS.register_module()
class MinkUNetBackbone(nn.Module):
    """4-stage sparse UNet (ref minkunet_backbone.py channel plan)."""
    in_channels: int = 4
    base_channels: int = 32
    encoder_channels: Sequence[int] = (32, 64, 128, 256)
    decoder_channels: Sequence[int] = (128, 96, 96)

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False):
        st = SparseConvLayer(self.base_channels, 3, subm=True,
                             name='stem')(st, train)
        skips = [st]
        for i, ch in enumerate(self.encoder_channels):
            st = SparseConvLayer(ch, 2, stride=2, padding=0, subm=False,
                                 name=f'down{i}')(st, train)
            st = SparseConvLayer(ch, 3, subm=True,
                                 name=f'enc{i}')(st, train)
            if i < len(self.encoder_channels) - 1:
                skips.append(st)
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[-(i + 1)]
            parent = _parent_lookup(skip, st)
            fpad = jnp.concatenate(
                [st.features,
                 jnp.zeros((1, st.features.shape[1]), st.features.dtype)],
                0)
            up = fpad[parent]
            merged = jnp.concatenate([up, skip.features], -1)
            st = SparseTensor(merged, skip.coords, skip.spatial_shape,
                              skip.batch_size)
            st = SparseConvLayer(ch, 3, subm=True,
                                 name=f'dec{i}')(st, train)
        return st


@MODELS.register_module()
class MinkUNet(nn.Module):
    """Sparse segmentor (ref segmentors/minkunet.py). Batch contract:
    points [B,P,C], points_mask [B,P], pts_semantic_mask [B,P] int32."""
    backbone: Any = None
    num_classes: int = 19
    voxel_size: Any = (0.05, 0.05, 0.05)
    point_cloud_range: Any = (-51.2, -51.2, -4.0, 51.2, 51.2, 2.4)
    max_voxels: int = 80000
    ignore_index: int = 255

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._cls = nn.Dense(self.num_classes)

    def _voxelize(self, points, points_mask):
        B, P, C = points.shape
        gx, gy, gz = grid_shape_of(tuple(self.voxel_size),
                                   tuple(self.point_cloud_range))
        V = self.max_voxels

        def one(p, m):
            coords = dynamic_voxelize(
                p, m, voxel_size=tuple(self.voxel_size),
                pc_range=tuple(self.point_cloud_range))
            vf, vc, p2v, _ = dynamic_scatter(
                p, coords, grid_shape=(gx, gy, gz), max_voxels=V,
                reduce='mean')
            return vf, vc, p2v

        vf, vc, p2v = jax.vmap(one)(points, points_mask)
        bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), V).reshape(B, V, 1)
        coords4 = jnp.concatenate(
            [jnp.where(vc[..., :1] >= 0, bidx, -1), vc], -1)
        st = SparseTensor(vf.reshape(B * V, C), coords4.reshape(B * V, 4),
                          (gz, gy, gx), B)   # spatial_shape is (nz, ny, nx)
        offs = (jnp.arange(B, dtype=jnp.int32) * V)[:, None]
        p2v_flat = jnp.where(p2v >= 0, p2v + offs, -1)   # [B, P]
        return st, p2v_flat

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        st, p2v = self._voxelize(batch['points'], batch['points_mask'])
        st = self._backbone(st, train=train)
        voxel_logits = self._cls(st.features)            # [B*V, K]
        pad = jnp.zeros((1, self.num_classes), voxel_logits.dtype)
        vl = jnp.concatenate([voxel_logits, pad], 0)
        idx = jnp.where(p2v >= 0, p2v, vl.shape[0] - 1)
        point_logits = vl[idx]                            # [B, P, K]
        if mode == 'tensor':
            return point_logits
        if mode == 'loss':
            labels = batch['pts_semantic_mask']
            w = (batch['points_mask'] & (labels != self.ignore_index)
                 & (p2v >= 0))
            ce = softmax_cross_entropy(
                point_logits, jnp.clip(labels, 0, self.num_classes - 1))
            return dict(loss_sem_seg=jnp.sum(ce * w)
                        / jnp.maximum(jnp.sum(w), 1.0))
        if mode == 'predict':
            return dict(
                pts_semantic_mask=jnp.argmax(point_logits, -1),
                logits=point_logits,
                mask=batch['points_mask'] & (p2v >= 0))
        raise ValueError(mode)
