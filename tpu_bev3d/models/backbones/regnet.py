"""RegNet-style BEV backbones: NoStemRegNet + MultiBackbone wrapper.

Refs: mmdet3d/models/backbones/nostem_regnet.py (RegNetX with the stem
stride removed — the nuScenes PointPillars RegNet configs feed a 64ch BEV
canvas directly) and mmdet3d/models/backbones/multi_backbone.py (N
parallel copies of a backbone over the same input, per-branch outputs
concatenated — the H3DNet 4-tower trick).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct


class Bottleneck(nn.Module):
    """RegNetX bottleneck (group conv, bottleneck ratio 1)."""
    channels: int
    stride: int = 1
    group_width: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = max(self.channels // self.group_width, 1)
        h = ConvBNAct(self.channels, 1, name='conv1')(x, train)
        h = ConvBNAct(self.channels, 3, stride=self.stride, padding=1,
                      groups=groups, name='conv2')(h, train)
        h = ConvBNAct(self.channels, 1, act=None, name='conv3')(h, train)
        if x.shape[-1] != self.channels or self.stride > 1:
            x = ConvBNAct(self.channels, 1, stride=self.stride, act=None,
                          name='down')(x, train)
        return nn.relu(h + x)


@MODELS.register_module()
class NoStemRegNet(nn.Module):
    """RegNetX trunk without the stride-2 stem (ref nostem_regnet.py)."""
    in_channels: int = 64
    stage_channels: Sequence[int] = (64, 160, 384)
    stage_blocks: Sequence[int] = (1, 4, 7)
    stage_strides: Sequence[int] = (2, 2, 2)
    group_width: int = 8
    out_indices: Sequence[int] = (0, 1, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, (ch, n, st) in enumerate(zip(self.stage_channels,
                                            self.stage_blocks,
                                            self.stage_strides)):
            for j in range(n):
                x = Bottleneck(ch, st if j == 0 else 1, self.group_width,
                               name=f's{i}_b{j}')(x, train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@MODELS.register_module()
class MultiBackbone(nn.Module):
    """N parallel towers over the same input; per-level outputs concat
    along channels, then a 1×1 aggregation conv (ref multi_backbone.py)."""
    num_streams: int = 2
    backbone: Any = None
    aggregation_channels: int = 0     # 0 → no aggregation conv

    @nn.compact
    def __call__(self, *args, train: bool = False, **kwargs):
        outs = []
        for i in range(self.num_streams):
            m = MODELS.build(dict(self.backbone))
            outs.append(m.__class__(
                **{f.name: getattr(m, f.name)
                   for f in m.__dataclass_fields__.values()
                   if f.name not in ('parent', 'name')},
                name=f'stream{i}')(*args, train=train, **kwargs))
        first = outs[0]
        if isinstance(first, dict):
            merged = dict(first)
            merged['fp_features'] = jnp.concatenate(
                [o['fp_features'] for o in outs], -1)
            if self.aggregation_channels:
                merged['fp_features'] = nn.Dense(
                    self.aggregation_channels,
                    name='agg')(merged['fp_features'])
            return merged
        if isinstance(first, (tuple, list)):
            merged = tuple(jnp.concatenate([o[l] for o in outs], -1)
                           for l in range(len(first)))
            if self.aggregation_channels:
                merged = tuple(nn.Conv(self.aggregation_channels, (1, 1),
                                       name=f'agg{l}')(m)
                               for l, m in enumerate(merged))
            return merged
        out = jnp.concatenate(outs, -1)
        if self.aggregation_channels:
            out = nn.Conv(self.aggregation_channels, (1, 1),
                          name='agg')(out)
        return out
