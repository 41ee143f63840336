"""DLA (Deep Layer Aggregation) backbone — DLA-34 layout.

Ref: mmdet3d/models/backbones/dla.py:1-445 (used by SMOKE / MonoFlex
configs) — BasicBlock trees with hierarchical Root aggregation, stages
[1, 1, 1, 2, 2, 1] × channels [16, 32, 64, 128, 256, 512].
NHWC flax rebuild.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = ConvBNAct(self.channels, 3, stride=self.stride, padding=1,
                        name='conv1')(x, train)
        out = ConvBNAct(self.channels, 3, padding=1, act=None,
                        name='conv2')(out, train)
        if residual.shape != out.shape:
            residual = ConvBNAct(self.channels, 1, act=None,
                                 name='proj')(
                nn.max_pool(residual, (self.stride, self.stride),
                            strides=(self.stride, self.stride))
                if self.stride > 1 else residual, train)
        return nn.relu(out + residual)


class Root(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = jnp.concatenate(feats, -1)
        x = ConvBNAct(self.channels, 1, act=None, name='conv')(x, train)
        return nn.relu(x + feats[0])


class Tree(nn.Module):
    levels: int
    channels: int
    stride: int = 1
    root_dim_extra: int = 0

    @nn.compact
    def __call__(self, x, children=None, train: bool = False):
        children = list(children) if children else []
        if self.stride > 1:
            bottom = nn.max_pool(x, (self.stride, self.stride),
                                 strides=(self.stride, self.stride))
        else:
            bottom = x
        if self.levels == 1:
            t1 = BasicBlock(self.channels, self.stride,
                            name='tree1')(x, train=train)
            t2 = BasicBlock(self.channels, 1, name='tree2')(t1,
                                                            train=train)
            return Root(self.channels, name='root')(
                [t2, t1, bottom] + children, train)
        t1 = Tree(self.levels - 1, self.channels, self.stride,
                  name='tree1')(x, train=train)
        return Tree(self.levels - 1, self.channels, 1,
                    name='tree2')(t1, children=[bottom] + children,
                                  train=train)


@MODELS.register_module()
class DLA(nn.Module):
    """DLA-34 by default; returns per-stage NHWC features."""
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    out_indices: Sequence[int] = (5,)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.channels[0], 7, padding=3,
                      name='base_layer')(x, train)
        outs = []
        for i, (lv, ch) in enumerate(zip(self.levels, self.channels)):
            if i == 0:
                x = ConvBNAct(ch, 3, padding=1,
                              name=f'level{i}')(x, train)
            elif i == 1:
                x = ConvBNAct(ch, 3, stride=2, padding=1,
                              name=f'level{i}')(x, train)
            else:
                x = Tree(lv, ch, stride=2, name=f'level{i}')(x,
                                                             train=train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
