"""PointNet++ multi-scale-grouping backbone (3DSSD-style).

Ref: mmdet3d/models/backbones/pointnet2_sa_msg.py — stacked MSG SA levels
(the 3DSSD encoder; no FP decoder — the last SA level's points feed the
candidate head directly). Output dict matches PointNet2SASSG's contract so
VoteHead-style heads consume either backbone.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.pointnet_ops import (furthest_point_sample,
                                 furthest_point_sample_fused)
from ...registry import MODELS
from ..layers.pointnet_modules import PointSAModuleMSG


def _fps_indices(xyz, feats, mask, num_point: int, mods):
    """Per-level sampling indices for fps_mods ('D-FPS' | 'F-FPS' | 'FS'
    combinations, ref pointnet2_sa_msg.py:66,103-121 / 3DSSD fusion
    sampling). 'FS' = half F-FPS + half D-FPS concatenated."""
    mods = list(mods)
    expand = []
    for m in mods:
        expand.extend(['F-FPS', 'D-FPS'] if m == 'FS' else [m])
    n_each = num_point // len(expand)
    counts = [n_each] * len(expand)
    counts[-1] += num_point - n_each * len(expand)
    parts = []
    for m, n in zip(expand, counts):
        if m == 'F-FPS' and feats is not None:
            parts.append(furthest_point_sample_fused(xyz, feats, mask, n))
        else:
            parts.append(furthest_point_sample(xyz, mask, n))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


class _SAMSGSingle(nn.Module):
    num_points: Sequence[int]
    radii: Sequence[Sequence[float]]
    num_samples: Sequence[Sequence[int]]
    sa_channels: Sequence[Sequence[Sequence[int]]]
    fps_mods: Sequence = None

    @nn.compact
    def __call__(self, pts, mask, train: bool = False):
        xyz = pts[:, :3]
        feats = pts[:, 3:] if pts.shape[1] > 3 else None
        for i in range(len(self.num_points)):
            indices = None
            if self.fps_mods is not None:
                indices = _fps_indices(xyz, feats, mask,
                                       self.num_points[i],
                                       self.fps_mods[i])
            xyz, feats, mask, _ = PointSAModuleMSG(
                self.num_points[i], tuple(self.radii[i]),
                tuple(self.num_samples[i]),
                tuple(tuple(c) for c in self.sa_channels[i]),
                name=f'sa{i}')(xyz, feats, mask, train, indices=indices)
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
    # per-level FPS modes, e.g. (('D-FPS',), ('FS',), ('F-FPS', 'D-FPS'))
    # — the 3DSSD fusion-sampling schedule (ref pointnet2_sa_msg.py:66)
    fps_mods: Any = None

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        vm = nn.vmap(
            _SAMSGSingle, in_axes=(0, 0, None), out_axes=0,
            variable_axes={'params': None}, split_rngs={'params': False},
            methods=['__call__'])
        fm = None if self.fps_mods is None else tuple(
            tuple(m) if isinstance(m, (list, tuple)) else (m,)
            for m in self.fps_mods)
        return vm(tuple(self.num_points),
                  tuple(tuple(r) for r in self.radii),
                  tuple(tuple(s) for s in self.num_samples),
                  tuple(tuple(tuple(c) for c in lvl)
                        for lvl in self.sa_channels),
                  fm,
                  name='net')(points, points_mask, train)
