"""PointNet++ SSG backbone (ref: mmdet3d/models/backbones/
pointnet2_sa_ssg.py — stacked SA modules + FP decoder, the VoteNet
backbone config: 4 SA (2048/1024/512/256 points) + 2 FP)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..layers.pointnet_modules import (PAConvSAModule, PointFPModule,
                                       PointSAModule)


class _PointNet2Single(nn.Module):
    """One-sample forward; batched via nn.vmap in the public module."""
    num_points: Sequence[int]
    radius: Sequence[float]
    num_samples: Sequence[int]
    sa_channels: Sequence[Sequence[int]]
    fp_channels: Sequence[Sequence[int]]
    sa_module: str = 'standard'   # 'standard' | 'paconv' (ref
    # backbones/pointnet2_sa_ssg.py sa_cfg type=PAConvSAModule)
    paconv_kernels: int = 8
    fps_chunks: int = 1
    ballq: str = ''

    @nn.compact
    def __call__(self, pts, mask, train: bool = False):
        xyz = pts[:, :3]
        feats = pts[:, 3:] if pts.shape[1] > 3 else None
        sa_xyz, sa_feats, sa_masks = [xyz], [feats], [mask]
        for i in range(len(self.num_points)):
            if self.sa_module == 'paconv':
                sa = PAConvSAModule(
                    self.num_points[i], self.radius[i],
                    self.num_samples[i], tuple(self.sa_channels[i]),
                    num_kernels=self.paconv_kernels,
                    fps_chunks=self.fps_chunks, ballq=self.ballq,
                    name=f'sa{i}')
            else:
                sa = PointSAModule(
                    self.num_points[i], self.radius[i],
                    self.num_samples[i], tuple(self.sa_channels[i]),
                    fps_chunks=self.fps_chunks, ballq=self.ballq,
                    name=f'sa{i}')
            nx, nf, nm, _ = sa(sa_xyz[-1], sa_feats[-1], sa_masks[-1],
                               train)
            sa_xyz.append(nx)
            sa_feats.append(nf)
            sa_masks.append(nm)
        fp_feats = sa_feats[-1]
        fp_xyz = sa_xyz[-1]
        for i, ch in enumerate(self.fp_channels):
            tgt = len(sa_xyz) - 2 - i
            fp_feats = PointFPModule(tuple(ch), name=f'fp{i}')(
                sa_xyz[tgt], fp_xyz, sa_feats[tgt], fp_feats,
                sa_masks[len(sa_xyz) - 1 - i], train)
            fp_xyz = sa_xyz[tgt]
        tgt_mask = sa_masks[len(sa_xyz) - 1 - len(self.fp_channels)]
        return dict(fp_xyz=fp_xyz, fp_features=fp_feats, fp_mask=tgt_mask)


@MODELS.register_module()
class PointNet2SASSG(nn.Module):
    in_channels: int = 4
    num_points: Sequence[int] = (2048, 1024, 512, 256)
    radius: Sequence[float] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Sequence[int] = (64, 32, 16, 16)
    sa_channels: Sequence[Sequence[int]] = (
        (64, 64, 128), (128, 128, 256), (128, 128, 256), (128, 128, 256))
    fp_channels: Sequence[Sequence[int]] = ((256, 256), (256, 256))
    sa_module: str = 'standard'   # 'paconv' → PAConv SA layers
    paconv_kernels: int = 8
    fps_chunks: int = 1   # >1 → bucketed subsample-union FPS (TPU fast)
    ballq: str = ''       # neighbor selection: ''|'exact'|'approx'

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        """points [B, P, C] (xyz + feats) → dict(fp_xyz [B, S, 3],
        fp_features [B, S, C'], fp_mask [B, S])."""
        vm = nn.vmap(
            _PointNet2Single,
            in_axes=(0, 0, None), out_axes=0,
            variable_axes={'params': None, 'batch_stats': None},
            split_rngs={'params': False},
            methods=['__call__'])
        return vm(tuple(self.num_points), tuple(self.radius),
                  tuple(self.num_samples),
                  tuple(tuple(c) for c in self.sa_channels),
                  tuple(tuple(c) for c in self.fp_channels),
                  self.sa_module, self.paconv_kernels, self.fps_chunks,
                  self.ballq,
                  name='net')(points, points_mask, train)
