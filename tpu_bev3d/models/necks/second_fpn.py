"""SECOND FPN neck (ref: mmdet3d/models/necks/second_fpn.py:12-94).

Per-scale deconv (or strided-conv for downscale) + channel concat. NHWC.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct, DeconvBNAct


@MODELS.register_module()
class SECONDFPN(nn.Module):
    in_channels: Sequence[int] = (128, 128, 256)
    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[float] = (1, 2, 4)
    use_conv_for_no_stride: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: tuple of [B, Hi, Wi, Ci] → [B, H0', W0', sum(out)]."""
        ups = []
        for i, f in enumerate(feats):
            s = self.upsample_strides[i]
            if s > 1 or (s == 1 and not self.use_conv_for_no_stride):
                u = DeconvBNAct(self.out_channels[i], kernel_size=int(s),
                                stride=int(s), name=f'deblock_{i}')(f, train)
            else:
                k = int(round(1 / s))
                u = ConvBNAct(self.out_channels[i], kernel_size=k, stride=k,
                              name=f'deblock_{i}')(f, train)
            ups.append(u)
        if len(ups) == 1:
            return ups[0]
        return jnp.concatenate(ups, axis=-1)
