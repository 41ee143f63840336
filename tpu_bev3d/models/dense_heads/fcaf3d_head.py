"""FCAF3D head: fully-convolutional anchor-free indoor detection over
sparse voxel features.

Ref: mmdet3d/models/dense_heads/fcaf3d_head.py (FCAF3DHead — per-voxel
classification + centerness + 6 face distances + yaw over MinkowskiEngine
features; assignment = voxels inside a GT box, pruned to the best level).

TPU form: the head consumes a fixed-capacity SparseTensor (active voxels +
coords); predictions, assignment (voxel-center-inside-box) and losses are
masked fixed-shape ops; decode emits top-k boxes.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.sparse_conv import SparseTensor
from ...registry import MODELS
from ..losses.losses import (binary_cross_entropy_with_logits,
                             sigmoid_focal_loss, smooth_l1_loss)


@MODELS.register_module()
class FCAF3DHead(nn.Module):
    num_classes: int = 18
    in_channels: int = 64
    voxel_size: Sequence[float] = (0.16, 0.16, 0.16)  # (x, y, z) meters
    pc_range: Sequence[float] = (-6.4, -6.4, -2.56, 6.4, 6.4, 2.56)
    max_num: int = 64
    score_thr: float = 0.05

    def _voxel_centers(self, st: SparseTensor):
        vs = jnp.asarray(self.voxel_size)
        origin = jnp.asarray(self.pc_range[:3])
        # coords are (b, z, y, x) → centers in (x, y, z)
        xyz_idx = st.coords[:, 3:0:-1].astype(jnp.float32)  # (x, y, z)
        return origin + (xyz_idx + 0.5) * vs

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False):
        h = nn.Dense(self.in_channels, name='fc')(st.features)
        h = nn.LayerNorm(name='ln')(h)
        h = nn.relu(h)
        cls = nn.Dense(self.num_classes, name='cls')(h)
        ctr = nn.Dense(1, name='ctr')(h)[:, 0]
        # 6 positive face distances + yaw sin/cos
        reg = nn.Dense(8, name='reg')(h)
        dists = jnp.exp(jnp.clip(reg[:, :6], -4, 4))
        yaw = jnp.arctan2(reg[:, 6], reg[:, 7])
        centers = self._voxel_centers(st)
        return dict(cls=cls, centerness=ctr, dists=dists, yaw=yaw,
                    centers=centers, valid=st.valid, raw_reg=reg)

    def decode(self, out):
        """distances (−x,+x,−y,+y,−z,+z from the voxel center) → 7-DoF box.
        """
        c = out['centers']
        d = out['dists']
        x = c[:, 0] + (d[:, 1] - d[:, 0]) / 2
        y = c[:, 1] + (d[:, 3] - d[:, 2]) / 2
        z = c[:, 2] + (d[:, 5] - d[:, 4]) / 2
        dx = d[:, 0] + d[:, 1]
        dy = d[:, 2] + d[:, 3]
        dz = d[:, 4] + d[:, 5]
        boxes = jnp.stack([x, y, z - dz / 2, dx, dy, dz, out['yaw']], -1)
        scores = jax.nn.sigmoid(out['cls']) \
            * jax.nn.sigmoid(out['centerness'])[:, None]
        return boxes, scores

    def predict_by_feat(self, out):
        boxes, scores = self.decode(out)
        N, K = scores.shape
        flat = jnp.where(out['valid'][:, None], scores, 0.0).reshape(N * K)
        top, idx = jax.lax.top_k(flat, self.max_num)
        sel = boxes[idx // K]
        return dict(bboxes=sel[None], scores=top[None],
                    labels=(idx % K)[None],
                    mask=(top > self.score_thr)[None])

    def loss_by_feat(self, out, gt_bboxes, gt_labels, gt_mask):
        """Single-sample GT (batch folded into the sparse table's batch
        column; losses computed jointly). gt_* [G, ...] padded."""
        c = out['centers']                     # [N, 3]
        gtb, gtl, gtm = gt_bboxes, gt_labels, gt_mask
        # voxel-inside-box assignment (axis-aligned approximation of the
        # ref's rotated test — indoor GT yaw is near 0 for ScanNet)
        ctr = gtb[:, :3] + gtb[:, 3:6] * jnp.asarray([0, 0, 0.5])
        rel = jnp.abs(c[:, None] - ctr[None])          # [N, G, 3]
        inside = jnp.all(rel < gtb[None, :, 3:6] / 2, -1) & gtm[None]
        vol = jnp.prod(gtb[:, 3:6], -1)
        vol = jnp.where(gtm, vol, 1e9)
        # each voxel matches its smallest containing box
        cost = jnp.where(inside, vol[None], 1e9)
        best = jnp.argmin(cost, -1)
        pos = inside.any(-1) & out['valid']
        npos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        g = gtb[best]
        labels = jnp.where(pos, gtl[best], self.num_classes)
        onehot = jax.nn.one_hot(labels, self.num_classes)
        l_cls = jnp.sum(sigmoid_focal_loss(out['cls'], onehot)
                        * out['valid'][:, None]) / npos
        # distance targets from voxel center to the 6 faces
        gctr = g[:, :3] + g[:, 3:6] * jnp.asarray([0, 0, 0.5])
        lo = gctr - g[:, 3:6] / 2
        hi = gctr + g[:, 3:6] / 2
        tgt = jnp.stack([c[:, 0] - lo[:, 0], hi[:, 0] - c[:, 0],
                         c[:, 1] - lo[:, 1], hi[:, 1] - c[:, 1],
                         c[:, 2] - lo[:, 2], hi[:, 2] - c[:, 2]], -1)
        l_reg = jnp.sum(smooth_l1_loss(out['dists'], jnp.maximum(tgt, 1e-3))
                        * pos[:, None]) / npos
        # centerness: min/max face-distance ratio (FCOS-style, ref fcaf3d)
        ratio = jnp.prod(
            jnp.minimum(tgt[:, ::2], tgt[:, 1::2])
            / jnp.maximum(jnp.maximum(tgt[:, ::2], tgt[:, 1::2]), 1e-6), -1)
        tgt_ctr = jnp.clip(ratio, 0, 1) ** (1 / 3)
        l_ctr = jnp.sum(binary_cross_entropy_with_logits(
            out['centerness'], jnp.where(pos, tgt_ctr, 0.0))
            * out['valid']) / jnp.maximum(jnp.sum(out['valid']), 1.0)
        return dict(loss_cls=l_cls, loss_bbox=l_reg,
                    loss_centerness=l_ctr)


@MODELS.register_module()
class MinkSingleStage3DDetector(nn.Module):
    """FCAF3D-style detector: sparse UNet backbone + per-voxel head
    (ref mmdet3d/models/detectors/mink_single_stage.py)."""
    backbone: Any = None
    bbox_head: Any = None
    voxel_size: Any = (0.16, 0.16, 0.16)
    point_cloud_range: Any = (-6.4, -6.4, -2.56, 6.4, 6.4, 2.56)
    max_voxels: int = 20000

    def setup(self):
        self._backbone = MODELS.build(dict(self.backbone))
        self._bbox_head = MODELS.build(dict(self.bbox_head))

    def __call__(self, batch, mode: str = 'tensor', train: bool = False):
        import jax as _jax
        from ...ops.voxelize import (dynamic_scatter, dynamic_voxelize,
                                     grid_shape_of)
        points, mask = batch['points'], batch['points_mask']
        B, P, C = points.shape
        gx, gy, gz = grid_shape_of(tuple(self.voxel_size),
                                   tuple(self.point_cloud_range))
        V = self.max_voxels

        def one(p, m):
            coords = dynamic_voxelize(
                p, m, voxel_size=tuple(self.voxel_size),
                pc_range=tuple(self.point_cloud_range))
            vf, vc, _, _ = dynamic_scatter(
                p, coords, grid_shape=(gx, gy, gz), max_voxels=V,
                reduce='mean')
            return vf, vc

        vf, vc = _jax.vmap(one)(points, mask)
        bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), V).reshape(B, V, 1)
        coords4 = jnp.concatenate(
            [jnp.where(vc[..., :1] >= 0, bidx, -1), vc], -1)
        st = SparseTensor(vf.reshape(B * V, C), coords4.reshape(B * V, 4),
                          (gz, gy, gx), B)
        st = self._backbone(st, train=train)
        out = self._bbox_head(st, train=train)
        if mode == 'tensor':
            return out
        if mode == 'loss':
            # fold batch: single-sample losses averaged (B small indoors)
            losses = None
            for b in range(B):
                sel = st.coords[:, 0] == b
                sub = {k: (v if v.ndim == 0 else v) for k, v in out.items()}
                sub = dict(out, valid=out['valid'] & sel)
                l = self._bbox_head.loss_by_feat(
                    sub, batch['gt_bboxes_3d'][b],
                    batch['gt_labels_3d'][b], batch['gt_mask'][b])
                losses = l if losses is None else \
                    {k: losses[k] + v for k, v in l.items()}
            return {k: v / B for k, v in losses.items()}
        if mode == 'predict':
            return self._bbox_head.predict_by_feat(out)
        raise ValueError(mode)
