"""SparseUNet middle encoder for Part-A² (exact reference topology).

Ref: mmdet3d/models/middle_encoders/sparse_unet.py:24-316 — 4 encoder
stages (first conv of stages 2-4 strided), z-reducing conv_out for the BEV
detection path, and a UNet decoder: per stage a SparseBasicBlock lateral,
a merge conv over concat(bottom, lateral), channel-reduced residual, and a
SparseInverseConv3d upsample back onto the previous stage's coordinate
table (subm conv at the last stage). Outputs both the BEV spatial features
and per-voxel seg features at input resolution (for PointwiseSemanticHead
part supervision).

TPU design: explicit fixed-capacity coordinate tables make the spconv
indice_key row-alignment contract explicit — the inverse conv writes onto
the cached encoder-stage coords, so decoder rows align with their lateral
stage by construction.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.sparse_conv import (SparseTensor, build_subm_rulebook,
                                sparse_inverse_conv3d)
from ...registry import MODELS
from ..layers.common import MaskedBatchNorm
from .sparse_encoder import SparseConvLayer


class SparseBasicBlock(nn.Module):
    """Residual subm block (ref mmdet3d layers/sparse_block.py
    SparseBasicBlock): conv-BN-ReLU-conv-BN + skip, ReLU. Works on both
    the flat SparseTensor and the block-sparse TileTensor."""
    channels: int
    compute_dtype: str = ''      # tile GEMM dtype (e.g. 'bfloat16')

    @nn.compact
    def __call__(self, st, train: bool = False,
                 rulebook=None):
        from ...ops.tile_sparse import TileTensor
        out = SparseConvLayer(self.channels, 3, subm=True,
                              compute_dtype=self.compute_dtype,
                              name='conv1')(st, train, rulebook=rulebook)
        out = SparseConvLayer(self.channels, 3, subm=True, act=False,
                              compute_dtype=self.compute_dtype,
                              name='conv2')(out, train, rulebook=rulebook)
        if isinstance(st, TileTensor):
            f = nn.relu(out.features + st.features)
            T, S = out.mask.shape
            f = jnp.where(jnp.repeat(out.mask, self.channels, axis=1),
                          f, 0.0)
            return out.replace_features(f)
        f = nn.relu(out.features + st.features)
        f = jnp.where(out.valid[:, None], f, 0.0)
        return SparseTensor(f, out.coords, out.spatial_shape,
                            out.batch_size)


class SparseInverseConvLayer(nn.Module):
    """Inverse conv (+BN+ReLU) onto a given target coordinate table.
    TileTensor inputs route through the GENERAL tile inverse conv
    (ops/tile_sparse.py tile_inverse_conv3d_general)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    compute_dtype: str = ''      # tile GEMM dtype (e.g. 'bfloat16')

    @nn.compact
    def __call__(self, st, target, train: bool = False):
        from ...ops.tile_sparse import (TileTensor,
                                        tile_inverse_conv3d_general)
        cin = st.channels if isinstance(st, TileTensor) \
            else st.features.shape[-1]
        k = int(np.prod(np.broadcast_to(
            np.asarray(self.kernel_size), (3,))))
        w = self.param('kernel',
                       nn.initializers.variance_scaling(1.0, 'fan_in',
                                                        'uniform'),
                       (k, cin, self.out_channels))
        if isinstance(st, TileTensor):
            cdt = (jnp.dtype(self.compute_dtype)
                   if self.compute_dtype else None)
            out = tile_inverse_conv3d_general(
                st, target, w, kernel_size=self.kernel_size,
                stride=self.stride, padding=self.padding,
                compute_dtype=cdt)
            T, S = out.mask.shape
            mflat = out.mask.reshape(-1)
            f = MaskedBatchNorm()(
                out.features.reshape(T * S, self.out_channels), mflat,
                train=train)
            f = jnp.where(mflat[:, None], nn.relu(f), 0.0)
            return out.replace_features(f.reshape(T, -1))
        out = sparse_inverse_conv3d(
            st, target.coords, target.valid, target.spatial_shape, w,
            kernel_size=self.kernel_size, stride=self.stride,
            padding=self.padding)
        f = MaskedBatchNorm()(out.features, out.valid, train=train)
        f = nn.relu(f)
        f = jnp.where(out.valid[:, None], f, 0.0)
        return SparseTensor(f, out.coords, out.spatial_shape,
                            out.batch_size)


@MODELS.register_module()
class SparseUNet(nn.Module):
    """Config surface mirrors the reference's (sparse_unet.py:43-115)."""
    in_channels: int = 4
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)  # (D, H, W)
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_paddings: Sequence[Sequence] = (
        (1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1))
    decoder_channels: Sequence[Sequence[int]] = (
        (64, 64, 64), (64, 64, 32), (32, 32, 16), (16, 16, 16))
    decoder_paddings: Sequence[Sequence] = (
        (1, 0), (1, 0), (0, 0), (0, 1))
    stage_capacity_factor: float = 1.0
    # 'flat' row gather-GEMM | 'tile' block-sparse (ops/tile_sparse.py)
    backend: str = 'flat'
    tile_shape: Tuple[int, int, int] = (2, 4, 4)
    # PER-SAMPLE active-tile caps [input, stage1, stage2, stage3]
    # (n_stages entries) — required for backend='tile'
    tile_capacities: Optional[Sequence[int]] = None
    tile_dtype: str = ''         # tile GEMM compute dtype ('bfloat16')

    @nn.compact
    def __call__(self, voxel_features, coors, batch_size: int,
                 train: bool = False):
        """→ dict(spatial_features [B, H/8, W/8, C·D'], seg_features
        [V, C_seg], seg_coords [V, 4], seg_valid [V])."""
        st = SparseTensor(voxel_features, coors,
                          tuple(self.sparse_shape), batch_size)
        n_stages = len(self.encoder_channels)
        is_tile = self.backend == 'tile'
        if is_tile:
            from ...ops.tile_sparse import tiles_from_sparse
            tcaps = self.tile_capacities
            if tcaps is None or len(tcaps) != n_stages:
                raise ValueError(
                    f"backend='tile' needs tile_capacities with "
                    f'{n_stages} entries [input, stage1, ...], got {tcaps}')
            st = tiles_from_sparse(st, self.tile_shape,
                                   int(tcaps[0]) * batch_size)
            rb = None
        else:
            rb = build_subm_rulebook(st, 3)
        st = SparseConvLayer(self.base_channels, 3, subm=True,
                             compute_dtype=self.tile_dtype,
                             name='conv_input')(st, train, rulebook=rb)
        cap = voxel_features.shape[0]
        encode_features = []
        rulebooks = [rb]
        for i, stage in enumerate(self.encoder_channels):
            for j, ch in enumerate(stage):
                pad = self.encoder_paddings[i][j]
                if i != 0 and j == 0:
                    # stage opens with the stride-2 spconv (ref :233-243)
                    if is_tile:
                        out_cap = int(tcaps[i]) * batch_size
                    else:
                        cap = max(int(cap * self.stage_capacity_factor),
                                  1)
                        out_cap = cap
                    st = SparseConvLayer(
                        ch, 3, stride=2, padding=pad, subm=False,
                        out_capacity=out_cap,
                        compute_dtype=self.tile_dtype,
                        name=f'encoder_{i}_{j}')(st, train)
                    rb = None if is_tile else build_subm_rulebook(st, 3)
                else:
                    st = SparseConvLayer(
                        ch, 3, subm=True,
                        compute_dtype=self.tile_dtype,
                        name=f'encoder_{i}_{j}')(st, train, rulebook=rb)
            encode_features.append(st)
            rulebooks.append(rb)
        # BEV path: z-reducing conv_out (ref :141-145, kernel (3,1,1) s2)
        out = SparseConvLayer(self.output_channels, (3, 1, 1), (2, 1, 1),
                              padding=0, subm=False,
                              out_capacity=(int(tcaps[-1]) * batch_size
                                            if is_tile else cap),
                              compute_dtype=self.tile_dtype,
                              name='conv_out')(encode_features[-1], train)
        if is_tile:
            from ...ops.tile_sparse import tile_dense
            dense = tile_dense(out)             # [B, C, D, H, W]
        else:
            dense = out.dense()                 # [B, C, D, H, W]
        B, C, D, H, W = dense.shape
        spatial = jnp.transpose(dense.reshape(B, C * D, H, W),
                                (0, 2, 3, 1))   # NHWC
        # UNet decoder (ref decoder_layer_forward:168-192)
        x = encode_features[-1]
        for k in range(n_stages, 0, -1):
            i = n_stages - k                    # decoder_channels index
            lateral_in = encode_features[k - 1]
            rb_k = rulebooks[k]                 # subm rulebook of stage k
            ch_lat = (lateral_in.channels if is_tile
                      else lateral_in.features.shape[-1])
            lat = SparseBasicBlock(
                ch_lat, compute_dtype=self.tile_dtype,
                name=f'lateral_layer{k}')(lateral_in, train, rulebook=rb_k)
            if is_tile:
                T, S = x.mask.shape
                cat3 = jnp.concatenate(
                    [x.features.reshape(T, S, -1),
                     lat.features.reshape(T, S, -1)], -1)
                cat = cat3.reshape(T * S, -1)
                cat_st = x.replace_features(cat3.reshape(T, -1))
            else:
                cat = jnp.concatenate([x.features, lat.features], -1)
                cat_st = SparseTensor(cat, x.coords, x.spatial_shape,
                                      x.batch_size)
            merge = SparseConvLayer(
                self.decoder_channels[i][1], 3, subm=True,
                compute_dtype=self.tile_dtype,
                name=f'merge_layer{k}')(cat_st, train, rulebook=rb_k)
            # channel-reduced residual (ref reduce_channel:194-211)
            n, cin = cat.shape
            cm = self.decoder_channels[i][1]
            red = cat.reshape(n, cm, cin // cm).sum(-1)
            if is_tile:
                summed = merge.replace_features(
                    merge.features + red.reshape(T, -1))
            else:
                summed = SparseTensor(merge.features + red, merge.coords,
                                      merge.spatial_shape,
                                      merge.batch_size)
            if k != 1:
                # inverse of the downsample that built stage k-1 from k-2:
                # same stride/padding (ref indice_key pairing spconv{k})
                x = SparseInverseConvLayer(
                    self.decoder_channels[i][2],
                    padding=self.encoder_paddings[k - 1][0],
                    compute_dtype=self.tile_dtype,
                    name=f'upsample_layer{k}')(
                        summed, encode_features[k - 2], train)
            else:
                x = SparseConvLayer(
                    self.decoder_channels[i][2], 3, subm=True,
                    padding=self.decoder_paddings[i][1],
                    compute_dtype=self.tile_dtype,
                    name=f'upsample_layer{k}')(summed, train,
                                               rulebook=rb_k)
        if is_tile:
            from ...ops.tile_sparse import tile_gather_voxels
            seg = tile_gather_voxels(x, coors)   # original row order
            return dict(spatial_features=spatial, seg_features=seg,
                        seg_coords=coors, seg_valid=coors[:, 0] >= 0)
        return dict(spatial_features=spatial, seg_features=x.features,
                    seg_coords=x.coords, seg_valid=x.valid)
