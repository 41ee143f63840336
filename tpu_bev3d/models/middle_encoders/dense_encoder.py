"""Dense 3D-conv voxel encoder — the TPU-first alternative to sparse conv.

The reference uses spconv because dense 3D conv is infeasible on GPUs at
these grid sizes. On TPU the trade flips: the sparse gather-GEMM's
random-row gathers are scalar-bound (~700 ms/frame for the BEVFusion
encoder), while a dense NDHWC conv over the same [41,1440,1440] grid is
pure MXU work (~1 TFLOP ≈ tens of ms at bf16). This encoder scatters the
voxel table into a dense volume and runs a SECOND-style stage plan as
dense 3D convs, reducing z into channels at the end exactly like
SparseEncoder (ref mmdet3d sparse_encoder.py:122-155 contract: same
[B, H/8, W/8, C_out·D'] BEV output).

space_to_depth packs each 2×2×2 voxel block into channels during the
scatter itself, so the full-resolution volume never exists: the first conv
already runs at half resolution with 8·C_in channels (MXU-friendly) and
peak activation memory drops to D·H·W·C_in/1 bytes spread over 8× fewer
spatial sites.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.scatter import voxel_scatter_dense
from ...registry import MODELS


class Conv3DBNAct(nn.Module):
    """3D conv + BN + ReLU (NDHWC).

    Measured on v5e: native XLA Conv3D beats a z-decomposed sum of 2D convs
    (149 vs 221 ms for the BEVFusion encoder), so the direct form stays.
    """
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


def scatter_space_to_depth(voxel_feats, coords, *, batch_size, nz, ny, nx):
    """Scatter [V, C] voxels into a 2×-packed dense volume
    [B, ⌈D/2⌉, ⌈X/2⌉, ⌈Y/2⌉, 8·C] (channel block = z%2·4 + x%2·2 + y%2).

    XY-ORDER spatial layout (rows = x bins) to match the reference
    BEVFusion sparse encoder's xy layout and our camera bev_pool."""
    V, C = voxel_feats.shape
    dz, dy, dx = (nz + 1) // 2, (ny + 1) // 2, (nx + 1) // 2
    valid = coords[:, 0] >= 0
    z, y, x = coords[:, 1], coords[:, 2], coords[:, 3]
    sub = (z % 2) * 4 + (x % 2) * 2 + (y % 2)
    flat = (coords[:, 0] * (dz * dx * dy) + (z // 2) * (dx * dy)
            + (x // 2) * dy + (y // 2))
    flat = jnp.where(valid, flat, batch_size * dz * dx * dy)
    onehot = jax.nn.one_hot(sub, 8, dtype=voxel_feats.dtype)
    wide = (onehot[:, :, None] * voxel_feats[:, None, :]).reshape(V, 8 * C)
    wide = jnp.where(valid[:, None], wide, 0)
    canvas = jnp.zeros((batch_size * dz * dx * dy, 8 * C),
                       voxel_feats.dtype)
    canvas = canvas.at[flat].add(wide, mode='drop')
    return canvas.reshape(batch_size, dz, dx, dy, 8 * C)


@MODELS.register_module()
class DenseVoxelEncoder(nn.Module):
    """Drop-in replacement for (BEVFusion)SparseEncoder.

    Output matches the sparse encoder contract: [B, H/8, W/8, out·Dz].
    """
    in_channels: int = 5
    sparse_shape: Tuple[int, int, int] = (41, 1440, 1440)  # (D, H, W)
    base_channels: int = 32
    stage_channels: Sequence[int] = (64, 128)
    output_channels: int = 128
    space_to_depth: bool = True
    # (1,3,3) halves the dominant full-res stem cost; z mixing happens in
    # the 3³ stage downsamples (and the s2d packing already mixed z pairs)
    stem_kernel: Tuple[int, int, int] = (1, 3, 3)

    @nn.compact
    def __call__(self, voxel_features, coors, batch_size: int,
                 train: bool = False):
        nz, ny, nx = self.sparse_shape
        if self.space_to_depth:
            # packed scatter: volume starts at half resolution
            x = scatter_space_to_depth(voxel_features, coors,
                                       batch_size=batch_size, nz=nz,
                                       ny=ny, nx=nx)
            x = Conv3DBNAct(self.base_channels, tuple(self.stem_kernel),
                            (1, 1, 1), name='stem')(x, train)
        else:
            dense = voxel_scatter_dense(
                voxel_features, coors, batch_size=batch_size, nz=nz,
                ny=ny, nx=nx)                          # [B, C, D, y, x]
            x = jnp.transpose(dense, (0, 2, 4, 3, 1))  # [B, D, x, y, C]
            x = Conv3DBNAct(self.base_channels, (3, 3, 3), (2, 2, 2),
                            name='stem')(x, train)
        for i, ch in enumerate(self.stage_channels):
            x = Conv3DBNAct(ch, (3, 3, 3), (2, 2, 2),
                            name=f'stage{i}_down')(x, train)
            x = Conv3DBNAct(ch, (3, 3, 3), name=f'stage{i}_conv')(x, train)
        # z-reduction conv (ref conv_out kernel (3,1,1) stride (2,1,1))
        x = Conv3DBNAct(self.output_channels, (3, 1, 1), (2, 1, 1),
                        padding='VALID', name='conv_out')(x, train)
        B, D, H, W, C = x.shape
        return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, H, W, D * C)
