"""PointNet++ multi-scale-grouping backbone (3DSSD-style).

Ref: mmdet3d/models/backbones/pointnet2_sa_msg.py — stacked MSG SA levels
(the 3DSSD encoder; no FP decoder — the last SA level's points feed the
candidate head directly). Output dict matches PointNet2SASSG's contract so
VoteHead-style heads consume either backbone.
"""
from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from ...registry import MODELS
from ..layers.pointnet_modules import PointSAModuleMSG


class _SAMSGSingle(nn.Module):
    num_points: Sequence[int]
    radii: Sequence[Sequence[float]]
    num_samples: Sequence[Sequence[int]]
    sa_channels: Sequence[Sequence[Sequence[int]]]

    @nn.compact
    def __call__(self, pts, mask, train: bool = False):
        xyz = pts[:, :3]
        feats = pts[:, 3:] if pts.shape[1] > 3 else None
        for i in range(len(self.num_points)):
            xyz, feats, mask, _ = PointSAModuleMSG(
                self.num_points[i], tuple(self.radii[i]),
                tuple(self.num_samples[i]),
                tuple(tuple(c) for c in self.sa_channels[i]),
                name=f'sa{i}')(xyz, feats, mask, train)
        return dict(fp_xyz=xyz, fp_features=feats, fp_mask=mask)


@MODELS.register_module()
class PointNet2SAMSG(nn.Module):
    in_channels: int = 4
    num_points: Sequence[int] = (4096, 512, 256)
    radii: Sequence[Sequence[float]] = ((0.2, 0.4, 0.8), (0.4, 0.8, 1.6),
                                        (1.6, 3.2, 4.8))
    num_samples: Sequence[Sequence[int]] = ((32, 32, 64), (32, 32, 32),
                                            (32, 32, 32))
    sa_channels: Sequence = (
        ((16, 16, 32), (16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 64, 128), (64, 96, 128)),
        ((128, 128, 256), (128, 192, 256), (128, 256, 256)))

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        vm = nn.vmap(
            _SAMSGSingle, in_axes=(0, 0, None), out_axes=0,
            variable_axes={'params': None}, split_rngs={'params': False},
            methods=['__call__'])
        return vm(tuple(self.num_points),
                  tuple(tuple(r) for r in self.radii),
                  tuple(tuple(s) for s in self.num_samples),
                  tuple(tuple(tuple(c) for c in lvl)
                        for lvl in self.sa_channels),
                  name='net')(points, points_mask, train)
