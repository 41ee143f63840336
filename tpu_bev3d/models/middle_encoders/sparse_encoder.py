"""Sparse middle encoders (SECOND / BEVFusion) on the TPU sparse-conv ops.

Refs: mmdet3d/models/middle_encoders/sparse_encoder.py:32-243 (SparseEncoder:
SubM input conv, 4 encoder stages with stride-2 downsamples, conv_out z
reduction, ``.dense()`` → [N, C*D, H, W]) and projects/BEVFusion/bevfusion/
sparse_encoder.py:14-156 (BEVFusionSparseEncoder — same topology, (1,1,3)
z-reducing conv_out, output reshaped to 256 channels).

TPU design: fixed-capacity SparseTensor tables; every conv is a gather-GEMM
scan over kernel offsets (ops/sparse_conv.py) so the FLOPs land on the MXU.
Per-stage output capacities are static config — downsampling merges voxels so
later stages can run smaller tables (less padding waste).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.sparse_conv import (SparseTensor, build_subm_rulebook,
                                sparse_conv3d, subm_conv3d)
from ...ops.tile_sparse import (TileTensor, sparse_conv3d_tile,
                                subm_conv3d_tile, tile_dense,
                                tiles_from_sparse)
from ...registry import MODELS
from ..layers.common import MaskedBatchNorm


class SparseConvLayer(nn.Module):
    """One sparse conv (+BN+ReLU). subm=True → submanifold."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    stride: Union[int, Tuple[int, int, int]] = 1
    padding: Union[int, Tuple[int, int, int]] = 0
    subm: bool = True
    out_capacity: Optional[int] = None
    use_bn: bool = True
    act: bool = True
    active_rule: str = 'floor'   # strided active-set rule (tile backend)
    compute_dtype: str = ''      # e.g. 'bfloat16' — tile-backend GEMM dtype
    bn_eps: float = 1e-3         # mmdet3d spconv BN eps; torchsparse 1e-5
    # strided tile backend only: re-tile the output to this shape (None →
    # keep the input tile shape). Pure relayout — per-stage tile shapes
    # let fill-rate-poor full-res stages use smaller tiles.
    out_tile_shape: Optional[Tuple[int, int, int]] = None

    @nn.compact
    def __call__(self, st, train: bool = False,
                 rulebook=None):
        cin = st.channels if isinstance(st, TileTensor) \
            else st.features.shape[-1]
        k = int(np.prod(np.broadcast_to(np.asarray(self.kernel_size), (3,))))
        fan_in = cin * k
        w = self.param('kernel',
                       nn.initializers.variance_scaling(1.0, 'fan_in',
                                                        'uniform'),
                       (k, cin, self.out_channels))
        if isinstance(st, TileTensor):
            # block-sparse backend — same params, tile-granular compute
            cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype \
                else None
            if self.subm:
                out = subm_conv3d_tile(st, w,
                                       kernel_size=self.kernel_size,
                                       compute_dtype=cdt)
            else:
                out = sparse_conv3d_tile(
                    st, w, kernel_size=self.kernel_size,
                    stride=self.stride, padding=self.padding,
                    out_tile_shape=self.out_tile_shape,
                    out_capacity=self.out_capacity,
                    rule=self.active_rule, compute_dtype=cdt)
            f = out.features                       # [T, S·Cout] flat rows
            mflat = out.mask.reshape(-1)
            fflat = f.reshape(-1, self.out_channels)
            if self.use_bn:
                fflat = MaskedBatchNorm(eps=self.bn_eps)(fflat, mflat,
                                                         train=train)
            if self.act:
                fflat = nn.relu(fflat)
            fflat = jnp.where(mflat[:, None], fflat, 0.0)
            return out.replace_features(fflat.reshape(f.shape))
        if self.subm:
            out = subm_conv3d(st, w, kernel_size=self.kernel_size,
                              rulebook=rulebook)
        else:
            out = sparse_conv3d(st, w, kernel_size=self.kernel_size,
                                stride=self.stride, padding=self.padding,
                                out_capacity=self.out_capacity)
        f = out.features
        if self.use_bn:
            f = MaskedBatchNorm(eps=self.bn_eps)(f, out.valid, train=train)
        if self.act:
            f = nn.relu(f)
        f = jnp.where(out.valid[:, None], f, 0.0)
        return SparseTensor(f, out.coords, out.spatial_shape, out.batch_size)


@MODELS.register_module()
class SparseEncoder(nn.Module):
    """SECOND middle encoder (ref sparse_encoder.py:32-243).

    sparse_shape: (nz, ny, nx) grid — e.g. (41, 1600, 1408) for SECOND-KITTI,
    (41, 1440, 1440) for BEVFusion/CenterPoint-style nuScenes grids.
    """
    in_channels: int = 4
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_paddings: Sequence[Sequence] = (
        (1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1))
    stage_capacity_factor: float = 1.0  # per-downsample capacity shrink
    conv_out_kernel: Tuple[int, int, int] = (3, 1, 1)
    xy_order: bool = False  # BEVFusion variant emits [B, x, y, C]
    conv_out_stride: Tuple[int, int, int] = (2, 1, 1)
    return_middle_feats: bool = False  # also return per-stage tensors (PV-RCNN)
    backend: str = 'flat'        # 'flat' gather-GEMM | 'tile' block-sparse
    tile_shape: Tuple[int, int, int] = (2, 4, 4)
    tile_capacity: int = 4096    # active tiles PER SAMPLE ('tile' backend)
    tile_stage_factor: float = 0.5   # tile-capacity shrink per downsample
    # explicit per-stage capacities [input, after_down0, after_down1, ...]
    # (PER SAMPLE; overrides the factor march). The spconv rule DILATES
    # the active set at the first stride-2 downsample (real demo frame:
    # 6960 input tiles -> 8146 after stage0, tools/probe_tile_occupancy),
    # so a monotone factor schedule either over-provisions the input or
    # silently drops post-downsample active sites — measured schedules
    # belong in the config.
    tile_capacities: Optional[Sequence[int]] = None
    tile_dtype: str = ''         # tile GEMM compute dtype (e.g. 'bfloat16')
    active_rule: str = 'floor'   # 'spconv' = exact receptive-field rule

    @nn.compact
    def __call__(self, voxel_features, coors, batch_size: int,
                 train: bool = False):
        """voxel_features [V, C]; coors [V, 4] (b, z, y, x) →
        BEV features [B, H', W', C*D'] (NHWC)."""
        st = SparseTensor(voxel_features, coors, tuple(self.sparse_shape),
                          batch_size)
        if self.backend == 'tile':
            caps = ([int(c) * batch_size for c in self.tile_capacities]
                    if self.tile_capacities else None)
            cap = caps[0] if caps else self.tile_capacity * batch_size
            st = tiles_from_sparse(st, self.tile_shape, cap)
            rb = None
        else:
            # SubM convs on the same coord table share one neighbor
            # rulebook — compute it once per stage instead of per conv
            rb = build_subm_rulebook(st, 3)
            cap = voxel_features.shape[0]
        st = SparseConvLayer(self.base_channels, 3, subm=True,
                             compute_dtype=self.tile_dtype,
                             name='conv_input')(st, train, rulebook=rb)
        n_stages = len(self.encoder_channels)
        encode_features = []
        for i, stage in enumerate(self.encoder_channels):
            for j, ch in enumerate(stage):
                pad = self.encoder_paddings[i][j]
                # stride-2 downsample is the LAST conv of every non-final
                # stage (ref SparseEncoder.make_encoder_layers,
                # sparse_encoder.py:176-243)
                if j == len(stage) - 1 and i != n_stages - 1:
                    if self.backend == 'tile':
                        cap = caps[i + 1] if caps else max(
                            -(-int(cap * self.tile_stage_factor) // 8) * 8,
                            8)
                    else:
                        cap = max(int(cap * self.stage_capacity_factor), 1)
                    st = SparseConvLayer(
                        ch, 3, stride=2, padding=pad, subm=False,
                        out_capacity=cap, active_rule=self.active_rule,
                        compute_dtype=self.tile_dtype,
                        name=f'encoder_{i}_{j}')(st, train)
                    if self.backend != 'tile':
                        rb = build_subm_rulebook(st, 3)
                else:
                    st = SparseConvLayer(
                        ch, 3, subm=True,
                        compute_dtype=self.tile_dtype,
                        name=f'encoder_{i}_{j}')(st, train, rulebook=rb)
            encode_features.append(st)
        st = SparseConvLayer(self.output_channels,
                             self.conv_out_kernel, self.conv_out_stride,
                             padding=0, subm=False, out_capacity=cap,
                             active_rule=self.active_rule,
                             compute_dtype=self.tile_dtype,
                             name='conv_out')(st, train)
        dense = tile_dense(st) if self.backend == 'tile' else st.dense()
        B, C, D, H, W = dense.shape
        out = dense.reshape(B, C * D, H, W)
        if self.xy_order:
            # BEVFusion's encoder is xy-order (rows = x bins), ref
            # projects/BEVFusion/bevfusion/sparse_encoder.py — matches the
            # camera bev_pool layout for fusion
            bev = jnp.transpose(out, (0, 3, 2, 1))  # [B, x, y, C·D]
        else:
            bev = jnp.transpose(out, (0, 2, 3, 1))  # NHWC [B, y, x, C·D]
        if self.return_middle_feats:
            return bev, encode_features
        return bev


@MODELS.register_module()
class BEVFusionSparseEncoder(SparseEncoder):
    """BEVFusion variant (ref projects/BEVFusion/bevfusion/
    sparse_encoder.py:14-156): z-reducing (1,1,3)-in-(H,W,D)-order conv_out ≡
    (3,1,1) over z in our (z,y,x) layout — i.e. identical math to the parent
    with BEVFusion's channel plan. Defaults mirror the lidar config
    (sparse_shape [1440,1440,41] → ours (41,1440,1440), output 256 = 128·D2).
    """
    in_channels: int = 5
    sparse_shape: Tuple[int, int, int] = (41, 1440, 1440)
    encoder_channels: Sequence[Sequence[int]] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    encoder_paddings: Sequence[Sequence] = (
        (0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0))
    base_channels: int = 16
    output_channels: int = 128
    xy_order: bool = True
