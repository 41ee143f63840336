"""3D anchor generation (host-side, numpy — anchors are static given the
config and featmap size, so they are precomputed once and closed over by the
jitted loss/predict functions; the reference regenerates them every forward,
ref: mmdet3d/models/task_modules/anchor/anchor_3d_generator.py).
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ...registry import TASK_UTILS


@TASK_UTILS.register_module()
class Anchor3DRangeGenerator:
    """Uniform anchor grid over 3D ranges (ref: Anchor3DRangeGenerator,
    anchor_3d_generator.py:12-185).

    Args:
      ranges: list of [x0, y0, z0, x1, y1, z1], one per class (or one shared).
      sizes: list of [dx, dy, dz] per class.
      rotations: e.g. [0, 1.57].
    """
    align = False

    def __init__(self, ranges: Sequence[Sequence[float]],
                 sizes: Sequence[Sequence[float]] = ((3.9, 1.6, 1.56),),
                 rotations: Sequence[float] = (0., 1.5707963),
                 reshape_out: bool = True, size_per_range: bool = True):
        if size_per_range and len(ranges) != len(sizes):
            assert len(ranges) == 1
            ranges = list(ranges) * len(sizes)
        self.ranges = [list(r) for r in ranges]
        self.sizes = [list(s) for s in sizes]
        self.rotations = list(rotations)
        self.reshape_out = reshape_out

    @property
    def num_base_anchors(self) -> int:
        """Anchors per grid location."""
        return len(self.sizes) * len(self.rotations)

    def grid_anchors(self, featmap_size) -> np.ndarray:
        """Anchors for one feature level.

        Returns [H, W, num_sizes*num_rots, 7] float32 (x,y,z,dx,dy,dz,yaw),
        or flattened [H*W*A, 7] if reshape_out.
        """
        H, W = featmap_size
        per_cls = []
        for rng, size in zip(self.ranges, self.sizes):
            x0, y0, z0, x1, y1, z1 = rng
            if self.align:
                # align anchor centers with voxel centers: shift half a cell
                xs = np.linspace(x0, x1, W, endpoint=False) \
                    + (x1 - x0) / W / 2
                ys = np.linspace(y0, y1, H, endpoint=False) \
                    + (y1 - y0) / H / 2
            else:
                xs = np.linspace(x0, x1, W)
                ys = np.linspace(y0, y1, H)
            zs = np.array([z0], np.float32)
            gy, gx = np.meshgrid(ys, xs, indexing='ij')        # [H, W]
            ctr = np.stack([gx, gy, np.full_like(gx, zs[0])], -1)  # [H,W,3]
            anc = []
            for rot in self.rotations:
                a = np.concatenate([
                    ctr,
                    np.broadcast_to(np.asarray(size, np.float32), ctr.shape),
                    np.full(ctr.shape[:2] + (1,), rot, np.float32)], -1)
                anc.append(a)
            per_cls.append(np.stack(anc, -2))   # [H, W, R, 7]
        out = np.concatenate(per_cls, -2).astype(np.float32)  # [H,W,C*R,7]
        # interleave so ordering is (size-major, rotation-minor) per location,
        # matching the reference's reshape contract for head channel layout
        H_, W_ = out.shape[:2]
        if self.reshape_out:
            return out.reshape(-1, 7)
        return out

    def anchor_classes(self, num_classes: int) -> np.ndarray:
        """Per-base-anchor class id [A] (size i ↔ class i when sizes are
        per class). Returns all -1 when sizes don't map 1:1 onto classes —
        consumers must then use CLASS-AGNOSTIC assignment (all anchors vs
        all GTs, ref train_mixins.anchor_target_3d without per-class
        filtering)."""
        n_rot = len(self.rotations)
        if len(self.sizes) == num_classes:
            return np.repeat(np.arange(num_classes), n_rot)
        return np.full((len(self.sizes) * n_rot,), -1, np.int64)


@TASK_UTILS.register_module()
class AlignedAnchor3DRangeGenerator(Anchor3DRangeGenerator):
    """Anchor centers aligned to voxel centers (ref:
    anchor_3d_generator.py:188-244)."""
    align = True
