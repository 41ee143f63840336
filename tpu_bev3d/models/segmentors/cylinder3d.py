"""Cylinder3D: cylindrical-partition LiDAR segmentation.

Ref: mmdet3d/models/segmentors/cylinder3d.py + backbones (Asymm3DSpconv
over a cylindrical (rho, phi, z) grid) + data_preprocessor 'cylindrical'
voxelize mode (data_preprocessor.py:397-428).

TPU design: reuse the MinkUNet sparse-UNet backbone over the cylindrical
voxel grid — the cylindrical partition changes only the point→voxel hash
(ops/voxelize.cylindrical_coords); point features are augmented with their
in-voxel cylindrical offsets like the reference's PFN-style encoder.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.sparse_conv import SparseTensor
from ...ops.voxelize import cylindrical_coords, dynamic_scatter
from ...registry import MODELS
from ..losses.losses import lovasz_softmax_loss, softmax_cross_entropy


@MODELS.register_module()
class Cylinder3D(nn.Module):
    backbone: Any = None
    num_classes: int = 19
    grid_shape: Any = (480, 360, 32)        # (n_rho, n_phi, n_z)
    pc_range_cyl: Any = (0.0, -np.pi, -4.0, 50.0, np.pi, 2.0)
    max_voxels: int = 60000
    ignore_index: int = 255
    # ref cylinder3d recipe: PFN-style point MLP before the max-scatter
    # (cylinder_3d VFE) and CE + Lovasz-softmax supervision
    point_mlp: Any = (64,)
    use_lovasz: bool = True
    lovasz_weight: float = 1.0

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._cls = nn.Dense(self.num_classes)
        self._pfn = [nn.Dense(ch, name=f'pfn{i}')
                     for i, ch in enumerate(self.point_mlp or ())]

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        points, points_mask = batch['points'], batch['points_mask']
        B, P, C = points.shape
        n_rho, n_phi, n_z = self.grid_shape
        V = self.max_voxels

        # per-point cylindrical features: (rho, phi, z) offsets to the
        # voxel center + raw xyz + extra channels (ref cylinder VFE),
        # then an MLP and a MAX reduce into voxels
        lo = jnp.asarray(self.pc_range_cyl[:3], jnp.float32)
        hi = jnp.asarray(self.pc_range_cyl[3:], jnp.float32)
        size = (hi - lo) / jnp.asarray(self.grid_shape, jnp.float32)
        rho = jnp.linalg.norm(points[..., :2], axis=-1)
        phi = jnp.arctan2(points[..., 1], points[..., 0])
        cyl = jnp.stack([rho, phi, points[..., 2]], -1)
        cell = jnp.floor((cyl - lo) / size)
        offs = cyl - (cell + 0.5) * size - lo
        feats = jnp.concatenate([offs, points], -1)
        for fc in self._pfn:
            feats = nn.relu(fc(feats))

        def one(p, f, m):
            coords = cylindrical_coords(
                p, m, grid_shape=tuple(self.grid_shape),
                pc_range_cyl=tuple(self.pc_range_cyl))
            vf, vc, p2v, _ = dynamic_scatter(
                f, coords, grid_shape=(n_rho, n_phi, n_z),
                max_voxels=V, reduce='max')
            return vf, vc, p2v

        vf, vc, p2v = jax.vmap(one)(points, feats, points_mask)
        bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), V).reshape(B, V, 1)
        coords4 = jnp.concatenate(
            [jnp.where(vc[..., :1] >= 0, bidx, -1), vc], -1)
        st = SparseTensor(vf.reshape(B * V, vf.shape[-1]),
                          coords4.reshape(B * V, 4),
                          (n_z, n_phi, n_rho), B)
        coords_in = st.coords                            # original row order
        st = self._backbone(st, train=train)
        from ...ops.tile_sparse import TileTensor, tile_gather_voxels
        if isinstance(st, TileTensor):
            feats = tile_gather_voxels(st, coords_in)
        else:
            feats = st.features
        voxel_logits = self._cls(feats)
        pad = jnp.zeros((1, self.num_classes), voxel_logits.dtype)
        vl = jnp.concatenate([voxel_logits, pad], 0)
        offs = (jnp.arange(B, dtype=jnp.int32) * V)[:, None]
        p2v_flat = jnp.where(p2v >= 0, p2v + offs, -1)
        idx = jnp.where(p2v_flat >= 0, p2v_flat, vl.shape[0] - 1)
        point_logits = vl[idx]
        if mode == 'tensor':
            return point_logits
        if mode == 'loss':
            labels = batch['pts_semantic_mask']
            w = (points_mask & (labels != self.ignore_index)
                 & (p2v_flat >= 0))
            ce = softmax_cross_entropy(
                point_logits, jnp.clip(labels, 0, self.num_classes - 1))
            losses = dict(loss_sem_seg=jnp.sum(ce * w)
                          / jnp.maximum(jnp.sum(w), 1.0))
            if self.use_lovasz:
                losses['loss_lovasz'] = self.lovasz_weight * \
                    lovasz_softmax_loss(point_logits, labels, w,
                                        self.ignore_index)
            return losses
        if mode == 'predict':
            return dict(pts_semantic_mask=jnp.argmax(point_logits, -1),
                        logits=point_logits,
                        mask=points_mask & (p2v_flat >= 0))
        raise ValueError(mode)
