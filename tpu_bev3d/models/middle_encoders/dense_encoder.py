"""Dense 3D-conv voxel encoder — the TPU-first alternative to sparse conv.

The reference uses spconv because dense 3D conv is infeasible on GPUs at
these grid sizes. On TPU the trade flips: the sparse gather-GEMM's
random-row gathers are scalar-bound (~700 ms/frame for the BEVFusion
encoder), while a dense NDHWC conv over the same [41,1440,1440] grid is
pure MXU work (~1 TFLOP ≈ tens of ms at bf16). This encoder scatters the
voxel table into a dense volume and runs the SECOND-style stage plan as
dense 3D convs, reducing z into channels at the end exactly like
SparseEncoder (ref mmdet3d sparse_encoder.py:122-155 contract: same
[B, H/8, W/8, C_out·D'] BEV output).

The stem conv downsamples immediately (stride 2) so the full-resolution
dense volume only exists at the input channel count — peak activation
memory ≈ D·H·W·C_in·2 bytes (0.9 GB for BEVFusion at bf16).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.scatter import voxel_scatter_dense
from ...registry import MODELS


class Conv3DBNAct(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: str = 'SAME'
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, self.kernel_size,
                    strides=self.stride, padding=self.padding,
                    use_bias=False, dtype=x.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=x.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x


@MODELS.register_module()
class DenseVoxelEncoder(nn.Module):
    """Drop-in replacement for (BEVFusion)SparseEncoder.

    Output matches the sparse encoder contract: [B, H/8, W/8, out·Dz].
    """
    in_channels: int = 5
    sparse_shape: Tuple[int, int, int] = (41, 1440, 1440)  # (D, H, W)
    base_channels: int = 16
    stage_channels: Sequence[int] = (32, 64, 128)
    output_channels: int = 128

    @nn.compact
    def __call__(self, voxel_features, coors, batch_size: int,
                 train: bool = False):
        nz, ny, nx = self.sparse_shape
        dense = voxel_scatter_dense(
            voxel_features, coors, batch_size=batch_size, nz=nz, ny=ny,
            nx=nx)                                   # [B, C, D, H, W]
        x = jnp.transpose(dense, (0, 2, 3, 4, 1))    # NDHWC
        # stem: immediate stride-2 downsample keeps the full-res volume at
        # C_in channels only
        x = Conv3DBNAct(self.base_channels, (3, 3, 3), (2, 2, 2),
                        name='stem')(x, train)       # D/2, H/2, W/2
        for i, ch in enumerate(self.stage_channels):
            stride = (2, 2, 2) if i > 0 else (1, 1, 1)
            x = Conv3DBNAct(ch, (3, 3, 3), stride,
                            name=f'stage{i}_down')(x, train)
            x = Conv3DBNAct(ch, (3, 3, 3), name=f'stage{i}_conv')(x, train)
        # z-reduction conv (ref conv_out kernel (3,1,1) stride (2,1,1))
        x = Conv3DBNAct(self.output_channels, (3, 1, 1), (2, 1, 1),
                        padding='VALID', name='conv_out')(x, train)
        B, D, H, W, C = x.shape
        return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, H, W, D * C)
