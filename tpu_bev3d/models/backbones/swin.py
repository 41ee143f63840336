"""Swin Transformer backbone (flax, NHWC).

TPU-native reimplementation of the mmdet SwinTransformer the reference's
BEVFusion config builds for the image branch (ref: projects/BEVFusion/
configs/nuscenes/bevfusion_lidar-cam_…py:16-35 — Swin-T: embed 96, depths
[2,2,6,2], heads [3,6,12,24], window 7, out_indices [1,2,3]).

TPU notes: window attention reshapes to [B·nW, win², C] and runs dense
attention — every matmul is MXU-shaped; shifted windows use jnp.roll (no
padding-mask gather); relative position bias is a static [win², win²] table
lookup. Feature maps are padded to window multiples and cropped after.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS


def window_partition(x, w):
    """[B, H, W, C] → [B*nH*nW, w, w, C] (H, W divisible by w)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, C)


def window_reverse(xw, w, B, H, W):
    C = xw.shape[-1]
    x = xw.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _rel_pos_index(w):
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing='ij')).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]        # [2, w², w²]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def drop_path(x, rate: float, train: bool, mod: nn.Module):
    """Stochastic depth on the residual branch (mmcv DropPath): whole
    samples are dropped with prob `rate`, survivors rescaled by 1/keep.
    No-op without a 'dropout' rng (ad-hoc applies; make_train_step always
    supplies one)."""
    if not train or rate <= 0.0 or not mod.has_rng('dropout'):
        return x
    keep = 1.0 - rate
    rng = mod.make_rng('dropout')
    mask = jax.random.bernoulli(rng, keep,
                                (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _maybe_dropout(mod: nn.Module, x, rate: float, train: bool):
    if rate <= 0.0:
        return x
    det = not (train and mod.has_rng('dropout'))
    return nn.Dropout(rate)(x, deterministic=det)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    # MXU tile packing: compute attention for `pack_windows` windows in
    # ONE pair of matmuls with a block-diagonal mask. A w8 window is 64
    # tokens with 32-wide heads — half-empty 128-lane MXU tiles; packing
    # 2 windows fills the tile (same systolic passes, 2 windows each),
    # trading 2x nominally-wasted FLOPs for ~2x attention throughput.
    # Bit-exact vs unpacked (cross-window logits are -inf → softmax 0).
    pack_windows: int = 1

    @nn.compact
    def __call__(self, x, attn_mask=None, train: bool = False):
        """x [nB, N, C] with N = window²; attn_mask [nW, N, N] or None."""
        nB, N, C = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * C, dtype=x.dtype, name='qkv')(x)
        q, k, v = jnp.split(qkv.reshape(nB, N, 3, h, C // h), 3, axis=2)
        q = q.squeeze(2).transpose(0, 2, 1, 3)           # [nB, h, N, d]
        k = k.squeeze(2).transpose(0, 2, 1, 3)
        v = v.squeeze(2).transpose(0, 2, 1, 3)
        scale = (C // h) ** -0.5
        w = self.window_size
        table = self.param('rel_pos_bias', nn.initializers.normal(0.02),
                           ((2 * w - 1) ** 2, h))
        idx = jnp.asarray(_rel_pos_index(w))             # [N, N]
        bias = table[idx].transpose(2, 0, 1)             # [h, N, N]
        p = self.pack_windows
        if p > 1 and nB % p == 0:
            G = nB // p
            d = C // h
            # [G, h, p·N, d]
            qp = q.reshape(G, p, h, N, d).transpose(0, 2, 1, 3, 4) \
                .reshape(G, h, p * N, d)
            kp = k.reshape(G, p, h, N, d).transpose(0, 2, 1, 3, 4) \
                .reshape(G, h, p * N, d)
            vp = v.reshape(G, p, h, N, d).transpose(0, 2, 1, 3, 4) \
                .reshape(G, h, p * N, d)
            attn = (qp * scale) @ kp.transpose(0, 1, 3, 2)  # [G,h,pN,pN]
            # block-diagonal additive mask: rel-pos bias (+ shift mask)
            # on the diagonal blocks, -inf off-diagonal
            big = jnp.full((p, N, p, N), -jnp.inf, jnp.float32)
            eye = jnp.arange(p)
            big = big.at[eye, :, eye, :].set(0.0)        # [p, N, p, N]
            block = big.reshape(1, p * N, p * N)         # [1, pN, pN]
            bias_big = jnp.zeros((h, p, N, p, N), jnp.float32)
            bias_big = bias_big.at[:, eye, :, eye, :].add(
                jnp.broadcast_to(bias[:, None], (h, p, N, N))
                .transpose(1, 0, 2, 3)).reshape(1, h, p * N, p * N)
            attn = attn + (block[:, None] + bias_big).astype(attn.dtype)
            if attn_mask is not None:
                nW = attn_mask.shape[0]
                # windows are consecutive per image-row ordering; the
                # per-window shift mask tiles along the packed diagonal
                am = attn_mask.reshape(-1, N, N)         # [nW, N, N]
                reps = nB // nW
                am_full = jnp.tile(am, (reps, 1, 1))     # [nB, N, N]
                amg = am_full.reshape(G, p, N, N)
                diag = jnp.zeros((G, p, N, p, N), jnp.float32)
                diag = diag.at[:, eye, :, eye, :].add(
                    amg.transpose(1, 0, 2, 3))
                attn = attn + diag.reshape(G, 1, p * N, p * N) \
                    .astype(attn.dtype)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = _maybe_dropout(self, attn, self.attn_drop, train)
            out = attn @ vp                              # [G, h, pN, d]
            out = out.reshape(G, h, p, N, d).transpose(0, 2, 3, 1, 4) \
                .reshape(nB, N, C)
        else:
            attn = (q * scale) @ k.transpose(0, 1, 3, 2)  # [nB, h, N, N]
            attn = attn + bias[None].astype(attn.dtype)
            if attn_mask is not None:
                nW = attn_mask.shape[0]
                attn = attn.reshape(nB // nW, nW, h, N, N) \
                    + attn_mask[None, :, None].astype(attn.dtype)
                attn = attn.reshape(nB, h, N, N)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = _maybe_dropout(self, attn, self.attn_drop, train)
            out = (attn @ v).transpose(0, 2, 1, 3).reshape(nB, N, C)
        out = nn.Dense(C, dtype=x.dtype, name='proj')(out)
        return _maybe_dropout(self, out, self.proj_drop, train)


class SwinBlock(nn.Module):
    """One Swin block on an UNPADDED feature map.

    Parity with mmdet's SwinBlock (mmdet swin.py, used by the BEVFusion
    config): norm1 → pad to window multiples (zeros) → (shift) → window
    attention → crop → residual; then norm2 → FFN → residual. Padding
    happens after norm1 (mmcv ShiftWindowMSA pads inside attn), LN eps is
    torch's 1e-5, GELU is exact — all load-bearing for checkpoint parity.
    """
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    # regularization (ref config drop_path_rate=0.2 linearly ramped across
    # blocks; drop_rate / attn_drop_rate knobs — bevfusion_lidar-cam
    # config :24-26). All inert at 0 / eval → checkpoint parity unchanged.
    drop_path_rate: float = 0.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    pack_windows: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, H, W, C] (unpadded)."""
        B, H, W, C = x.shape
        w = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype)(x)
        ph, pw = (-H) % w, (-W) % w
        Hp, Wp = H + ph, W + pw
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        # mmdet's ShiftWindowMSA shifts whenever shift_size > 0 (no
        # small-map special case); the wrap mask handles every shape
        shift = self.shift
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            # attention mask for wrapped windows (static, computed in numpy
            # on the PADDED grid, matching mmcv ShiftWindowMSA)
            img_mask = np.zeros((1, Hp, Wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -shift),
                       slice(-shift, None)):
                for ws in (slice(0, -w), slice(-w, -shift),
                           slice(-shift, None)):
                    img_mask[:, hs, ws, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), w).reshape(-1, w * w)
            attn_mask = jnp.where(mw[:, None, :] != mw[:, :, None],
                                  -100.0, 0.0)
        else:
            attn_mask = None
        xw = window_partition(x, w).reshape(-1, w * w, C)
        xw = WindowAttention(self.dim, self.num_heads, w,
                             attn_drop=self.attn_drop_rate,
                             proj_drop=self.drop_rate,
                             pack_windows=self.pack_windows)(
                                 xw, attn_mask, train=train)
        x = window_reverse(xw.reshape(-1, w, w, C), w, B, Hp, Wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + drop_path(x, self.drop_path_rate, train, self)
        y = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype)(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=x.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = _maybe_dropout(self, y, self.drop_rate, train)
        y = nn.Dense(C, dtype=x.dtype)(y)
        y = _maybe_dropout(self, y, self.drop_rate, train)
        return x + drop_path(y, self.drop_path_rate, train, self)


class PatchMerging(nn.Module):
    """2×2 patch merge. Channel order matches mmcv's nn.Unfold(k=2, s=2):
    index = c*4 + (di*2 + dj) (channel-major), NOT the position-major
    order of the original Swin repo — load-bearing for converting mmdet
    checkpoints' norm/reduction weights without permutation."""
    out_dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # pad to even (right/bottom, like mmcv)
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x00 = x[:, 0::2, 0::2]
        x01 = x[:, 0::2, 1::2]
        x10 = x[:, 1::2, 0::2]
        x11 = x[:, 1::2, 1::2]
        x = jnp.stack([x00, x01, x10, x11], -1)       # [B,H2,W2,C,4]
        x = x.reshape(x.shape[:3] + (C * 4,))         # c*4 + q layout
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype)(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=x.dtype)(x)


@MODELS.register_module()
class SwinTransformer(nn.Module):
    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (1, 2, 3)
    # ref bevfusion_lidar-cam config :24-26 (Swin-T recipe: 0.2 stochastic
    # depth, no plain dropout). Ramped linearly 0 → drop_path_rate across
    # all blocks like mmdet's dpr = linspace(0, drop_path_rate, sum(depths)).
    drop_path_rate: float = 0.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    # MXU window packing (see WindowAttention.pack_windows); bit-exact,
    # applied when the window count divides evenly
    pack_windows: int = 1
    # jax.checkpoint each block: recompute activations in the backward
    # pass instead of storing them. The camera branch is the train-time
    # activation hog (6 cams at 256x704 through 12 blocks); remat trades
    # ~1 extra forward of FLOPs for O(depth) less HBM, enabling larger
    # per-chip batches. Gradients are bit-identical (test_swin_remat).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, H, W, 3] → tuple of NHWC stage features at out_indices."""
        p = self.patch_size
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p), padding='VALID',
                    dtype=x.dtype, name='patch_embed')(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name='patch_norm')(x)
        x = _maybe_dropout(self, x, self.drop_rate, train)
        outs = []
        dim = self.embed_dims
        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        # train is arg 2 of SwinBlock.__call__ (0 = module) — static under
        # remat, same recipe as backbones/vovnet.py:77
        block_cls = (nn.remat(SwinBlock, static_argnums=(2,))
                     if self.remat else SwinBlock)
        for i, depth in enumerate(self.depths):
            w = self.window_size
            for d in range(depth):
                shift = 0 if d % 2 == 0 else w // 2
                x = block_cls(dim, self.num_heads[i], w, shift,
                              self.mlp_ratio,
                              drop_path_rate=float(dpr[bi]),
                              drop_rate=self.drop_rate,
                              attn_drop_rate=self.attn_drop_rate,
                              pack_windows=self.pack_windows,
                              name=f'stage{i}_block{d}')(x, train)
                bi += 1
            if i in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-5, dtype=x.dtype,
                                         name=f'out_norm{i}')(x))
            if i < len(self.depths) - 1:
                dim *= 2
                x = PatchMerging(dim, name=f'merge{i}')(x)
        return tuple(outs)
