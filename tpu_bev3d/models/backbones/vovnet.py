"""VoVNetCP backbone (One-Shot Aggregation).

Ref: projects/PETR/petr/vovnetcp.py:346 (VoVNetCP — OSA modules: a chain
of 3×3 convs whose outputs are all concatenated once and fused by a 1×1,
with optional identity + eSE attention; stages downsample by max-pool).
NHWC; checkpointing ('CP') is jax.checkpoint on the OSA stage when
``use_checkpoint``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..layers.common import ConvBNAct


class eSE(nn.Module):
    """Effective Squeeze-Excitation (ref vovnetcp.py Hsigmoid/eSEModule)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c, (1, 1), name='fc')(s)
        return x * jnp.clip((s + 3.0) / 6.0, 0.0, 1.0)


class OSAModule(nn.Module):
    stage_ch: int
    concat_ch: int
    layer_per_block: int = 5
    identity: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        outs = [x]
        for i in range(self.layer_per_block):
            x = ConvBNAct(self.stage_ch, 3, padding=1,
                          name=f'conv{i}')(x, train)
            outs.append(x)
        x = jnp.concatenate(outs, -1)
        x = ConvBNAct(self.concat_ch, 1, name='concat_conv')(x, train)
        x = eSE(name='ese')(x)
        if self.identity and identity.shape[-1] == x.shape[-1]:
            x = x + identity
        return x


@MODELS.register_module()
class VoVNetCP(nn.Module):
    """VoVNet-39/57 style (ref vovnetcp.py stage specs)."""
    stem_ch: Sequence[int] = (64, 64, 128)
    stage_ch: Sequence[int] = (128, 160, 192, 224)
    concat_ch: Sequence[int] = (256, 512, 768, 1024)
    block_per_stage: Sequence[int] = (1, 1, 2, 2)
    layer_per_block: int = 5
    out_indices: Sequence[int] = (2, 3)
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.stem_ch[0], 3, stride=2, padding=1,
                      name='stem0')(x, train)
        x = ConvBNAct(self.stem_ch[1], 3, padding=1, name='stem1')(x, train)
        x = ConvBNAct(self.stem_ch[2], 3, stride=2, padding=1,
                      name='stem2')(x, train)
        outs = []
        for si in range(len(self.stage_ch)):
            if si > 0:
                # ref vovnetcp.py:312 MaxPool2d(3, 2, ceil_mode=True):
                # windows anchor at 0,2,4,... with a partial tail window
                # — END-only padding (flax pads max_pool with -inf,
                # matching ceil_mode's partial-window semantics; one end
                # pad yields ceil sizing for even H and is inert for odd
                # H). The previous symmetric pad-1 pool was MISALIGNED
                # by one pixel vs the reference checkpoints.
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=((0, 1), (0, 1)))
            cls = (nn.remat(OSAModule, static_argnums=(2,))
                   if self.use_checkpoint else OSAModule)
            for bi in range(self.block_per_stage[si]):
                x = cls(self.stage_ch[si], self.concat_ch[si],
                        self.layer_per_block, identity=bi > 0,
                        name=f'stage{si}_osa{bi}')(x, train)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)
