"""Multi-Scale Deformable Attention sampling (MSDeformAttn core).

Replaces the reference's CUDA kernel (ref: mmcv ops
multi_scale_deform_attn.py — ms_deform_attn_core used by deformable-DETR
style heads). Per query and head, sample each value level at predicted
fractional locations (bilinear) and combine with softmax attention
weights.

TPU design: the bilinear gathers are vectorized per level; everything is
fixed-shape [B, Q, H, L, P] and lands on gathers + one weighted sum.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn(value, spatial_shapes, sampling_locations,
                   attention_weights):
    """Args:
      value: [B, S, H, D] — flattened multi-level features (S = Σ h·w),
        H heads, D per-head channels.
      spatial_shapes: static tuple of (h, w) per level.
      sampling_locations: [B, Q, H, L, P, 2] normalized to [0, 1] per
        level (x, y).
      attention_weights: [B, Q, H, L, P] (already softmaxed over L·P).
    Returns: [B, Q, H·D].
    """
    B, S, H, D = value.shape
    B2, Q, H2, L, P, _ = sampling_locations.shape
    offsets = []
    off = 0
    for (h, w) in spatial_shapes:
        offsets.append(off)
        off += h * w
    out = jnp.zeros((B, Q, H, D), value.dtype)
    for li, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value, offsets[li], h * w,
                                           axis=1)     # [B, hw, H, D]
        loc = sampling_locations[:, :, :, li]           # [B, Q, H, P, 2]
        # normalized [0,1] → continuous pixel coords (align like mmcv:
        # loc * (w, h) - 0.5)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        dx = x - x0
        dy = y - y0

        v_hd = jnp.transpose(v_l, (0, 2, 1, 3))  # [B, H, hw, D]

        def gather(xi, yi):
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            flat = jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w \
                + jnp.clip(xi, 0, w - 1).astype(jnp.int32)  # [B,Q,H,P]
            fl = jnp.transpose(flat, (0, 2, 1, 3)).reshape(B, H, Q * P)
            g = jax.vmap(jax.vmap(lambda vm, fm: vm[fm]))(v_hd, fl)
            g = jnp.transpose(g.reshape(B, H, Q, P, D), (0, 2, 1, 3, 4))
            return g * inb[..., None].astype(value.dtype)

        g00 = gather(x0, y0)
        g01 = gather(x0 + 1, y0)
        g10 = gather(x0, y0 + 1)
        g11 = gather(x0 + 1, y0 + 1)
        samp = (g00 * ((1 - dx) * (1 - dy))[..., None]
                + g01 * (dx * (1 - dy))[..., None]
                + g10 * ((1 - dx) * dy)[..., None]
                + g11 * (dx * dy)[..., None])   # [B, Q, H, P, D]
        w_l = attention_weights[:, :, :, li]    # [B, Q, H, P]
        out = out + jnp.sum(samp * w_l[..., None], axis=3)
    return out.reshape(B, Q, H * D)
