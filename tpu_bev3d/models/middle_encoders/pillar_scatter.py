"""Pillar → dense BEV canvas (ref: mmdet3d/models/middle_encoders/
pillar_scatter.py:11 PointPillarsScatter)."""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.scatter import pillar_scatter
from ...registry import MODELS


@MODELS.register_module()
class PointPillarsScatter(nn.Module):
    """Scatter pillar features onto [B, ny, nx, C] (NHWC out — the backbone
    convs consume channels-last on TPU; the reference emits NCHW,
    pillar_scatter.py:64-105)."""
    in_channels: int = 64
    output_shape: Tuple[int, int] = (496, 432)  # (ny, nx)

    @nn.compact
    def __call__(self, voxel_feats, coords, batch_size: int,
                 train: bool = False):
        ny, nx = self.output_shape
        canvas = pillar_scatter(voxel_feats, coords, batch_size=batch_size,
                                ny=ny, nx=nx)          # [B, C, ny, nx]
        return jnp.transpose(canvas, (0, 2, 3, 1))     # NHWC
