"""SECOND BEV backbone (ref: mmdet3d/models/backbones/second.py:15-95).

Strided Conv2d stages over the dense BEV canvas, multi-scale outputs.
NHWC layout throughout (TPU-preferred).
"""
from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct


@MODELS.register_module()
class SECOND(nn.Module):
    in_channels: int = 128
    out_channels: Sequence[int] = (128, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, H, W, C] → tuple of per-stage features (NHWC)."""
        outs = []
        for i, n in enumerate(self.layer_nums):
            x = ConvBNAct(self.out_channels[i], 3,
                          stride=self.layer_strides[i], padding=1,
                          name=f'block_{i}_0')(x, train)
            for j in range(n):
                x = ConvBNAct(self.out_channels[i], 3, padding=1,
                              name=f'block_{i}_{j + 1}')(x, train)
            outs.append(x)
        return tuple(outs)
