"""Standard FPN + the StreamPETR CPFPN variant.

Ref: mmdet FPN (lateral 1x1 -> top-down nearest-upsample add -> 3x3 out)
as consumed by the PETR/StreamPETR configs, and
projects/StreamPETR/stream_petr/models/necks/cp_fpn.py:15 — an FPN with
activation checkpointing (`with_cp`) and out convs only on the used
levels. GeneralizedLSSFPN (concat-based) is the BEVFusion neck; this is
the classic additive one.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS


@MODELS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 3
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: tuple of NHWC maps, coarsest last → tuple(num_outs)."""
        n = len(self.in_channels)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral{i}')(feats[i])
            for i in range(n)
        ]
        # top-down pathway: nearest-neighbour upsample + add
        for i in range(n - 1, 0, -1):
            up = jax.image.resize(
                laterals[i], laterals[i - 1].shape, method='nearest')
            laterals[i - 1] = laterals[i - 1] + up

        def out_conv(i, x):
            conv = nn.Conv(self.out_channels, (3, 3), padding='SAME',
                           name=f'out{i}')
            if self.use_checkpoint and train:
                return nn.remat(lambda m, v: m(v))(conv, x)
            return conv(x)

        outs = [out_conv(i, laterals[i]) for i in range(n)]
        # extra levels by stride-2 max pool on the last output (mmdet
        # add_extra_convs=False default)
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs[:self.num_outs])


@MODELS.register_module()
class CPFPN(FPN):
    """Checkpointed FPN (ref cp_fpn.py — `with_cp` FPN used by the
    StreamPETR VoVNet configs)."""
    use_checkpoint: bool = True
