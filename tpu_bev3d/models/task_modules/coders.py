"""Box coders (pure jnp, fixed-shape).

Refs: mmdet3d/models/task_modules/coders/delta_xyzwhlr_bbox_coder.py (SECOND /
PointPillars anchor deltas) and centerpoint_bbox_coders.py (CenterPoint
heatmap decode).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import TASK_UTILS


@TASK_UTILS.register_module()
class DeltaXYZWLHRBBoxCoder:
    """Anchor-delta coder (ref: delta_xyzwhlr_bbox_coder.py:10-91).

    Encoding (z refers to box *center*, anchors store bottom z):
      za += ha/2 ; diag = sqrt(la² + wa²)
      xt = (xg-xa)/diag, yt = (yg-ya)/diag, zt = (zg-za)/ha
      lt = log(lg/la), wt = log(wg/wa), ht = log(hg/ha), rt = rg - ra
    Velocity dims (if code_size 9) are plain differences.
    """

    def __init__(self, code_size: int = 7):
        self.code_size = code_size

    def encode(self, gt, anchors):
        xa, ya, za, wa, la, ha, ra = jnp.split(anchors[..., :7], 7, -1)
        xg, yg, zg, wg, lg, hg, rg = jnp.split(gt[..., :7], 7, -1)
        za = za + ha * 0.5
        zg = zg + hg * 0.5
        diag = jnp.sqrt(la ** 2 + wa ** 2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / ha
        wt = jnp.log(wg / wa)
        lt = jnp.log(lg / la)
        ht = jnp.log(hg / ha)
        rt = rg - ra
        out = [xt, yt, zt, wt, lt, ht, rt]
        if self.code_size > 7:
            out.append(gt[..., 7:self.code_size] - anchors[..., 7:self.code_size])
        return jnp.concatenate(out, -1)

    def decode(self, anchors, deltas):
        xa, ya, za, wa, la, ha, ra = jnp.split(anchors[..., :7], 7, -1)
        xt, yt, zt, wt, lt, ht, rt = jnp.split(deltas[..., :7], 7, -1)
        za = za + ha * 0.5
        diag = jnp.sqrt(la ** 2 + wa ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * ha + za
        # clip the log-dims: keeps early-training/garbage weights finite
        # (e^8 ≈ 3000× the anchor — far beyond any physical box)
        wg = jnp.exp(jnp.clip(wt, -8, 8)) * wa
        lg = jnp.exp(jnp.clip(lt, -8, 8)) * la
        hg = jnp.exp(jnp.clip(ht, -8, 8)) * ha
        rg = rt + ra
        zg = zg - hg * 0.5
        out = [xg, yg, zg, wg, lg, hg, rg]
        if self.code_size > 7:
            out.append(deltas[..., 7:self.code_size]
                       + anchors[..., 7:self.code_size])
        return jnp.concatenate(out, -1)


@TASK_UTILS.register_module()
class CenterPointBBoxCoder:
    """CenterPoint heatmap decoder (ref: centerpoint_bbox_coders.py:9-229).

    Decodes top-K peaks of a class heatmap plus regression maps into boxes.
    Fixed-shape: always returns max_num boxes + validity mask.
    """

    def __init__(self, pc_range, out_size_factor, voxel_size,
                 post_center_range=None, max_num: int = 100,
                 score_threshold=None, code_size: int = 9):
        self.pc_range = tuple(pc_range)
        self.out_size_factor = out_size_factor
        self.voxel_size = tuple(voxel_size)
        self.post_center_range = tuple(post_center_range) \
            if post_center_range is not None else None
        self.max_num = max_num
        self.score_threshold = score_threshold
        self.code_size = code_size

    def decode(self, heat, rot_sine, rot_cosine, hei, dim, vel, reg):
        """All inputs NHWC: heat [B,H,W,C], reg [B,H,W,2], hei [B,H,W,1],
        dim [B,H,W,3], rot_* [B,H,W,1], vel [B,H,W,2] or None.

        Returns dict(bboxes [B,K,code_size], scores [B,K], labels [B,K],
        mask [B,K]).
        """
        B, H, W, num_cls = heat.shape
        K = self.max_num
        flat = heat.reshape(B, H * W * num_cls)
        scores, inds = jax.lax.top_k(flat, K)          # [B, K]
        labels = inds % num_cls
        pix = inds // num_cls
        ys = (pix // W).astype(jnp.float32)
        xs = (pix % W).astype(jnp.float32)

        def g(m):
            return jax.vmap(lambda mm, ii: mm.reshape(H * W, -1)[ii])(m, pix)

        reg_k = g(reg)                                  # [B,K,2]
        hei_k = g(hei)[..., 0]
        dim_k = g(dim)                                  # [B,K,3]
        rots = g(rot_sine)[..., 0]
        rotc = g(rot_cosine)[..., 0]
        rot = jnp.arctan2(rots, rotc)
        xs = (xs + reg_k[..., 0]) * self.out_size_factor * self.voxel_size[0] \
            + self.pc_range[0]
        ys = (ys + reg_k[..., 1]) * self.out_size_factor * self.voxel_size[1] \
            + self.pc_range[1]
        parts = [xs[..., None], ys[..., None], hei_k[..., None], dim_k,
                 rot[..., None]]
        if vel is not None:
            parts.append(g(vel))
        bboxes = jnp.concatenate(parts, -1)
        mask = jnp.ones_like(scores, bool)
        if self.score_threshold is not None:
            mask &= scores > self.score_threshold
        if self.post_center_range is not None:
            pcr = jnp.asarray(self.post_center_range)
            mask &= jnp.all(bboxes[..., :3] >= pcr[:3], -1)
            mask &= jnp.all(bboxes[..., :3] <= pcr[3:], -1)
        return dict(bboxes=bboxes, scores=scores, labels=labels, mask=mask)
