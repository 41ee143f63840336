"""Common NN building blocks (flax.linen, NHWC layout).

TPU-native replacement for mmcv's ConvModule / build_conv_layer stack.
All 2D convs operate on NHWC (TPU-preferred layout: channels on the
128-lane minor dimension feeds the MXU without relayout). BatchNorm uses
flax's batch_stats collection; cross-device stat sync (the reference's
SyncBN, tools/train.py:23-29) happens via ``axis_name='data'`` when the
train step runs under shard_map/pjit.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class ConvBNAct(nn.Module):
    """Conv2d + BN + activation (ref: mmcv ConvModule, NHWC here).

    padding: int → symmetric SAME-style explicit padding.
    """
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int], str] = 0
    dilation: int = 1
    groups: int = 1
    use_bn: bool = True
    act: Optional[str] = 'relu'
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    bias: Optional[bool] = None
    sync_axis: Optional[str] = None  # set to mesh axis name for SyncBN

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = _pair(self.kernel_size)
        st = _pair(self.stride)
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            p = _pair(self.padding)
            pad = [(p[0], p[0]), (p[1], p[1])]
        use_bias = (not self.use_bn) if self.bias is None else self.bias
        x = nn.Conv(self.out_channels, ks, strides=st, padding=pad,
                    kernel_dilation=_pair(self.dilation),
                    feature_group_count=self.groups, use_bias=use_bias,
                    dtype=x.dtype)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=self.bn_eps,
                             axis_name=self.sync_axis if train else None,
                             dtype=x.dtype)(x)
        if self.act == 'relu':
            x = nn.relu(x)
        elif self.act == 'gelu':
            x = nn.gelu(x)
        elif self.act is not None:
            raise ValueError(self.act)
        return x


class DeconvBNAct(nn.Module):
    """ConvTranspose2d + BN + ReLU (ref: SECONDFPN deblocks,
    mmdet3d/models/necks/second_fpn.py:41-74). NHWC."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    stride: Union[int, Tuple[int, int]] = 2
    use_bn: bool = True
    act: Optional[str] = 'relu'
    bn_eps: float = 1e-3
    bn_momentum: float = 0.99
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.out_channels, _pair(self.kernel_size),
                             strides=_pair(self.stride), padding='VALID',
                             use_bias=not self.use_bn, dtype=x.dtype)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=self.bn_eps,
                             axis_name=self.sync_axis if train else None,
                             dtype=x.dtype)(x)
        if self.act == 'relu':
            x = nn.relu(x)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over a padded row table [N, C] with validity mask.

    Matches the reference's BN-over-points semantics in VFE layers
    (mmdet3d/models/voxel_encoders/utils.py:15-95 applies BatchNorm1d over
    flattened valid points) without letting padding rows poison the stats.
    """
    momentum: float = 0.99
    eps: float = 1e-3
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        C = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        if train:
            w = mask.astype(jnp.float32).reshape(
                mask.shape + (1,) * (x.ndim - mask.ndim))
            n = jnp.sum(w)
            red = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            if self.sync_axis is not None:
                n = jax.lax.psum(n, self.sync_axis)
                mean = jax.lax.psum(jnp.sum(xf * w, red), self.sync_axis) \
                    / jnp.maximum(n, 1.0)
                var = jax.lax.psum(
                    jnp.sum(w * (xf - mean) ** 2, red), self.sync_axis) \
                    / jnp.maximum(n, 1.0)
            else:
                mean = jnp.sum(xf * w, red) / jnp.maximum(n, 1.0)
                var = jnp.sum(w * (xf - mean) ** 2, red) / jnp.maximum(n, 1.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var.astype(x.dtype) + jnp.asarray(self.eps, x.dtype))
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class MLP(nn.Module):
    """Dense stack with optional BN+ReLU per layer."""
    features: Sequence[int]
    use_bn: bool = True
    act: Optional[str] = 'relu'
    final_act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=not self.use_bn, dtype=x.dtype)(x)
            last = i == len(self.features) - 1
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3,
                                 dtype=x.dtype)(x)
            if (not last or self.final_act) and self.act == 'relu':
                x = nn.relu(x)
        return x
