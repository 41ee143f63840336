"""GeneralizedLSSFPN (ref: projects/BEVFusion/bevfusion/
bevfusion_necks.py:11-96): top-down FPN where upsampled higher level is
CONCATENATED (not added) with the lateral, then 1×1 + 3×3 convs. NHWC."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct


def resize_nearest(x, hw):
    B, H, W, C = x.shape
    h, w = hw
    ry = (jnp.arange(h) * H // h).astype(jnp.int32)
    rx = (jnp.arange(w) * W // w).astype(jnp.int32)
    return x[:, ry][:, :, rx]


def resize_bilinear(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method='bilinear')


@MODELS.register_module()
class GeneralizedLSSFPN(nn.Module):
    in_channels: Sequence[int] = (192, 384, 768)
    out_channels: int = 256
    num_outs: int = 3
    start_level: int = 0
    upsample_mode: str = 'bilinear'

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: tuple of NHWC maps, fine→coarse. Returns same count of
        out_channels maps (ref forward:75-96)."""
        laterals = list(feats[self.start_level:])
        n = len(laterals)
        resize = (resize_bilinear if self.upsample_mode == 'bilinear'
                  else resize_nearest)
        # top-down: level i concats the upsampled (already-processed) level
        # i+1; the TOP level stays raw and is NOT emitted (ref :75-96 —
        # used_backbone_levels = len-1)
        for i in range(n - 2, -1, -1):
            up = resize(laterals[i + 1], laterals[i].shape[1:3])
            x = jnp.concatenate([laterals[i], up], -1)
            x = ConvBNAct(self.out_channels, 1, bn_eps=1e-5,
                          name=f'lateral_{i}')(x, train)
            x = ConvBNAct(self.out_channels, 3, padding=1, bn_eps=1e-5,
                          name=f'fpn_{i}')(x, train)
            laterals[i] = x
        return tuple(laterals[:min(self.num_outs, n - 1)])
