"""Torch re-implementation of mmdet's SwinTransformer layer layout, used
ONLY as the conversion-parity oracle in tests.

Written from the mmdet/mmcv architecture spec (state-dict names
patch_embed.projection, stages.N.blocks.M.{norm1,attn.w_msa.*,norm2,
ffn.layers.0.0,ffn.layers.1}, stages.N.downsample.{norm,reduction},
norm{i}) so that converting a randomly-initialized instance through
tpu_bev3d.utils.mappings.swin_mapping must reproduce its forward outputs.
"""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _rel_pos_index(w):
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing='ij')).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return torch.from_numpy(
        (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int64))


class WindowMSA(nn.Module):
    def __init__(self, dim, num_heads, window_size):
        super().__init__()
        self.dim, self.num_heads, self.window_size = dim, num_heads, window_size
        self.scale = (dim // num_heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window_size - 1) ** 2, num_heads) * 0.02)
        self.register_buffer('relative_position_index',
                             _rel_pos_index(window_size))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B, N, C = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, h)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B // nW, nW, h, N, N) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, h, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class ShiftWindowMSA(nn.Module):
    def __init__(self, dim, num_heads, window_size, shift_size):
        super().__init__()
        self.window_size, self.shift_size = window_size, shift_size
        self.w_msa = WindowMSA(dim, num_heads, window_size)

    def forward(self, query, hw_shape):
        B, L, C = query.shape
        H, W = hw_shape
        query = query.view(B, H, W, C)
        w = self.window_size
        pad_r = (w - W % w) % w
        pad_b = (w - H % w) % w
        query = F.pad(query, (0, 0, 0, pad_r, 0, pad_b))
        Hp, Wp = H + pad_b, W + pad_r
        if self.shift_size > 0:
            shifted = torch.roll(query, (-self.shift_size, -self.shift_size),
                                 dims=(1, 2))
            img_mask = torch.zeros((1, Hp, Wp, 1))
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -self.shift_size),
                       slice(-self.shift_size, None)):
                for ws in (slice(0, -w), slice(-w, -self.shift_size),
                           slice(-self.shift_size, None)):
                    img_mask[:, hs, ws, :] = cnt
                    cnt += 1
            mw = img_mask.view(1, Hp // w, w, Wp // w, w, 1) \
                .permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w)
            attn_mask = (mw.unsqueeze(1) - mw.unsqueeze(2))
            attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0)
        else:
            shifted, attn_mask = query, None
        xw = shifted.view(B, Hp // w, w, Wp // w, w, C) \
            .permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)
        xw = self.w_msa(xw, attn_mask)
        x = xw.view(B, Hp // w, Wp // w, w, w, C) \
            .permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if self.shift_size > 0:
            x = torch.roll(x, (self.shift_size, self.shift_size),
                           dims=(1, 2))
        x = x[:, :H, :W].reshape(B, H * W, C)
        return x


class FFN(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(dim, hidden), nn.GELU(), nn.Dropout(0.)),
            nn.Linear(hidden, dim), nn.Dropout(0.))

    def forward(self, x, identity):
        return identity + self.layers(x)


class SwinBlockT(nn.Module):
    def __init__(self, dim, num_heads, window_size, shift_size, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = ShiftWindowMSA(dim, num_heads, window_size, shift_size)
        self.norm2 = nn.LayerNorm(dim)
        self.ffn = FFN(dim, int(dim * mlp_ratio))

    def forward(self, x, hw_shape):
        x = x + self.attn(self.norm1(x), hw_shape)
        return self.ffn(self.norm2(x), identity=x)


class PatchMergingT(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.sampler = nn.Unfold(kernel_size=2, stride=2)
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, hw_shape):
        B, L, C = x.shape
        H, W = hw_shape
        x = x.view(B, H, W, C).permute(0, 3, 1, 2)
        if H % 2 or W % 2:
            x = F.pad(x, (0, W % 2, 0, H % 2))
        x = self.sampler(x)               # [B, 4C, L'] (c-major order)
        x = x.transpose(1, 2)             # [B, L', 4C]
        return self.reduction(self.norm(x)), ((H + 1) // 2, (W + 1) // 2)


class PatchEmbedT(nn.Module):
    def __init__(self, in_ch, embed):
        super().__init__()
        self.projection = nn.Conv2d(in_ch, embed, 4, stride=4)
        self.norm = nn.LayerNorm(embed)

    def forward(self, x):
        x = self.projection(x)
        B, C, H, W = x.shape
        return self.norm(x.flatten(2).transpose(1, 2)), (H, W)


class StageT(nn.Module):
    def __init__(self, dim, depth, num_heads, window_size, downsample):
        super().__init__()
        self.blocks = nn.ModuleList([
            SwinBlockT(dim, num_heads, window_size,
                       0 if i % 2 == 0 else window_size // 2)
            for i in range(depth)])
        self.downsample = PatchMergingT(dim) if downsample else None

    def forward(self, x, hw_shape):
        for b in self.blocks:
            x = b(x, hw_shape)
        if self.downsample is not None:
            xd, hw2 = self.downsample(x, hw_shape)
            return x, hw_shape, xd, hw2
        return x, hw_shape, x, hw_shape


class SwinRef(nn.Module):
    """mmdet-layout Swin. state_dict names match mmdet's SwinTransformer."""

    def __init__(self, embed_dims=96, depths=(2, 2, 6, 2),
                 num_heads=(3, 6, 12, 24), window_size=7,
                 out_indices=(1, 2, 3), in_ch=3):
        super().__init__()
        self.out_indices = out_indices
        self.patch_embed = PatchEmbedT(in_ch, embed_dims)
        self.stages = nn.ModuleList()
        dim = embed_dims
        for i, d in enumerate(depths):
            self.stages.append(StageT(dim, d, num_heads[i], window_size,
                                      i < len(depths) - 1))
            if i < len(depths) - 1:
                dim *= 2
        dim = embed_dims
        for i in range(len(depths)):
            if i in out_indices:
                self.add_module(f'norm{i}', nn.LayerNorm(dim))
            dim *= 2

    def forward(self, x):
        x, hw = self.patch_embed(x)
        outs = []
        for i, stage in enumerate(self.stages):
            out, out_hw, x, hw = stage(x, hw)
            if i in self.out_indices:
                out = getattr(self, f'norm{i}')(out)
                B, L, C = out.shape
                outs.append(out.view(B, *out_hw, C))   # NHWC for comparison
        return outs
