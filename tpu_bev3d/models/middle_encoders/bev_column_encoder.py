"""BEV column encoder — z-to-channels + 2D convs, the fastest TPU middle
encoder for BEVFusion-scale grids.

Motivation (measured on v5e, see tools/profile_blocks.py): the reference's
sparse 3D conv (spconv, ref mmdet3d sparse_encoder.py) maps to scalar-bound
gathers on TPU (~700 ms); a dense NDHWC Conv3D runs but XLA tiles 3-spatial
convolutions poorly (~117 ms device time at [41,1440,1440], ~2% MXU). This
encoder removes 3D convolution entirely: each BEV column's z-axis is packed
into the channel dimension during the scatter, and all compute is large
channels-last 2D convs — exactly what the MXU tiles best. FLOPs ≈ 0.4 TF
per frame, a few ms at bf16.

Functionally this plays SparseEncoder's role (points → [B, H/8, W/8, C]
BEV features, ref sparse_encoder.py:122-155 contract); architecturally it
is a deliberate TPU-first redesign (cited as such, not weight-compatible
with torch sparse-encoder checkpoints — use SparseEncoder + its mapping
table for checkpoint parity runs).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS


def scatter_columns(voxel_feats, coords, *, batch_size: int, nz: int,
                    ny: int, nx: int, pack_xy: int = 2):
    """Scatter [V, C] voxels into a column canvas
    [B, nx/p, ny/p, nz*p²*C] (z fastest-varying in channel groups).

    XY-ORDER: rows are x bins, matching the reference BEVFusion sparse
    encoder's xy layout (projects/BEVFusion/bevfusion/sparse_encoder.py)
    and our bev_pool camera BEV.

    coords [V, 4] int32 (b, z, y, x); padding rows have b = -1.
    """
    V, C = voxel_feats.shape
    p = pack_xy
    dx, dy = (nx + p - 1) // p, (ny + p - 1) // p
    nsub = nz * p * p
    valid = coords[:, 0] >= 0
    z, y, x = coords[:, 1], coords[:, 2], coords[:, 3]
    sub = z * (p * p) + (x % p) * p + (y % p)
    rows = coords[:, 0] * (dx * dy) + (x // p) * dy + (y // p)
    rows = jnp.where(valid, rows, batch_size * dx * dy)
    onehot = jax.nn.one_hot(sub, nsub, dtype=voxel_feats.dtype)
    wide = (onehot[:, :, None] * voxel_feats[:, None, :]).reshape(
        V, nsub * C)
    wide = jnp.where(valid[:, None], wide, 0)
    canvas = jnp.zeros((batch_size * dx * dy, nsub * C), voxel_feats.dtype)
    canvas = canvas.at[rows].add(wide, mode='drop')
    return canvas.reshape(batch_size, dx, dy, nsub * C)


@MODELS.register_module()
class BEVColumnEncoder(nn.Module):
    """Drop-in replacement for (BEVFusion)SparseEncoder / DenseVoxelEncoder.

    Output: [B, ny/total_stride, nx/total_stride, output_channels].
    With defaults: [B, 180, 180, 256] for the 1440² grid (pack 2 × strides
    2·2 = 8 total downsample, like the sparse encoder's 3 strided stages).
    """
    in_channels: int = 5
    sparse_shape: Tuple[int, int, int] = (41, 1440, 1440)  # (D, H, W)
    stage_channels: Sequence[int] = (128, 128, 256, 256)
    stage_strides: Sequence[int] = (2, 1, 2, 1)
    output_channels: int = 256
    pack_xy: int = 2

    @nn.compact
    def __call__(self, voxel_features, coors, batch_size: int,
                 train: bool = False):
        nz, ny, nx = self.sparse_shape
        x = scatter_columns(voxel_features, coors, batch_size=batch_size,
                            nz=nz, ny=ny, nx=nx, pack_xy=self.pack_xy)
        for i, (ch, st) in enumerate(zip(self.stage_channels,
                                         self.stage_strides)):
            x = nn.Conv(ch, (3, 3), strides=(st, st), padding='SAME',
                        use_bias=False, dtype=x.dtype, name=f'conv{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=x.dtype,
                             name=f'bn{i}')(x)
            x = nn.relu(x)
        if self.output_channels != x.shape[-1]:
            x = nn.Conv(self.output_channels, (1, 1), use_bias=False,
                        dtype=x.dtype, name='conv_out')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=x.dtype,
                             name='bn_out')(x)
            x = nn.relu(x)
        return x
