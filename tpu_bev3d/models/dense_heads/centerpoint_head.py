"""CenterPoint head (ref: mmdet3d/models/dense_heads/centerpoint_head.py).

SeparateHead:20 (per-branch conv stacks), CenterHead:244 (multi-task heads,
gaussian heatmap targets get_targets_single:446, loss_by_feat:609 Gaussian
focal + L1, predict_by_feat:693 decode + NMS).

TPU design: heatmap targets are rendered inside jit by a ``lax.scan``
max-accumulation of per-object gaussians over the (static) BEV grid — no
host round-trip, fully fused by XLA. GT arrives padded [B, G, 9+] + mask.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import MODELS, TASK_UTILS
from ...ops.nms import circle_nms_mask, nms_bev_mask
from ..losses.losses import gaussian_focal_loss, l1_loss
from ..layers.common import ConvBNAct


def gaussian_radius(dims_hw, min_overlap=0.1):
    """Per-object gaussian radius (ref mmdet3d/models/utils/gaussian.py).
    dims_hw: (..., 2) (h, w) in feature cells."""
    h, w = dims_hw[..., 0], dims_hw[..., 1]
    a1 = 1
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_heatmap(H, W, centers, radii, valid):
    """Max-combined gaussians → [H, W].

    centers [O, 2] float (x, y) in cells; radii [O]; valid [O].
    Ref draw_heatmap_gaussian (models/utils/gaussian.py): sigma = (2r+1)/6,
    support clipped to the radius box.
    """
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]

    def body(acc, inp):
        c, r, v = inp
        cx, cy = jnp.floor(c[0]), jnp.floor(c[1])
        sigma = (2 * r + 1) / 6.0
        d2 = (xs - cx) ** 2 + (ys - cy) ** 2
        g = jnp.exp(-d2 / (2 * sigma ** 2 + 1e-12))
        g = jnp.where((d2 <= r ** 2) & v, g, 0.0)
        return jnp.maximum(acc, g), None

    out, _ = jax.lax.scan(body, jnp.zeros((H, W)), (centers, radii, valid))
    return out


class SeparateHead(nn.Module):
    """Per-branch conv stacks (ref centerpoint_head.py:20-123).
    heads: {name: (out_channels, num_convs)}."""
    heads: Any
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = {}
        for name, (out_c, num_conv) in dict(self.heads).items():
            h = x
            for i in range(num_conv - 1):
                h = ConvBNAct(self.head_conv, self.final_kernel,
                              padding=(self.final_kernel - 1) // 2,
                              name=f'{name}_conv{i}')(h, train)
            bias_init = (nn.initializers.constant(self.init_bias)
                         if name == 'heatmap' else nn.initializers.zeros)
            h = nn.Conv(out_c, (self.final_kernel, self.final_kernel),
                        padding=(self.final_kernel - 1) // 2,
                        bias_init=bias_init, name=f'{name}_out')(h)
            out[name] = h
        return out


@MODELS.register_module()
class CenterHead(nn.Module):
    """Multi-task center head (ref centerpoint_head.py:244-925).

    tasks: sequence of dicts {'class_names': [...]} — classes are indexed
    globally in task order.
    """
    in_channels: int = 512
    tasks: Sequence[dict] = (dict(num_class=1, class_names=['car']),)
    share_conv_channel: int = 64
    common_heads: Any = None   # {'reg': (2,2), 'height': (1,2), ...}
    bbox_coder: Optional[dict] = None
    # target cfg (ref train_cfg)
    grid_size: Tuple[int, int] = (1024, 1024)   # (nx, ny) at voxel res
    voxel_size: Tuple[float, float] = (0.1, 0.1)
    point_cloud_range: Tuple[float, ...] = (-51.2, -51.2, -5., 51.2, 51.2, 3.)
    out_size_factor: int = 8
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    code_weights: Sequence[float] = (1., 1., 1., 1., 1., 1., 1., 1., 0.2, 0.2)
    max_objs: int = 100
    norm_bbox: bool = True
    with_velocity: bool = True
    # test cfg
    nms_type: str = 'circle'       # 'circle' | 'rotate'
    min_radius_by_task: Sequence[float] = (4, 12, 10, 1, 0.85, 0.175)
    nms_iou_thr: float = 0.2
    post_max_size: int = 83
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 0.25

    def setup(self):
        heads = self.common_heads or {
            'reg': (2, 2), 'height': (1, 2), 'dim': (3, 2), 'rot': (2, 2),
            **({'vel': (2, 2)} if self.with_velocity else {})}
        self.shared_conv = ConvBNAct(self.share_conv_channel, 3, padding=1)
        self.task_heads = [
            SeparateHead(heads={**{k: tuple(v) for k, v in heads.items()},
                                'heatmap': (len(t['class_names']), 2)},
                         head_conv=64, name=f'task_{i}')
            for i, t in enumerate(self.tasks)]
        if self.bbox_coder is not None:
            self._coder = TASK_UTILS.build(dict(self.bbox_coder))
        else:
            from ..task_modules.coders import CenterPointBBoxCoder
            self._coder = CenterPointBBoxCoder(
                pc_range=self.point_cloud_range[:2],
                out_size_factor=self.out_size_factor,
                voxel_size=self.voxel_size[:2],
                post_center_range=None, max_num=self.post_max_size,
                code_size=9 if self.with_velocity else 7)
        # global class index base per task
        sizes = [len(t['class_names']) for t in self.tasks]
        self._cls_base = np.concatenate([[0], np.cumsum(sizes)[:-1]])

    def __call__(self, x, train: bool = False):
        """x [B, H, W, C] → list of task dicts of NHWC maps."""
        x = self.shared_conv(x, train)
        return [h(x, train) for h in self.task_heads]

    # ---------------- targets + loss ---------------------------------------

    def get_targets_single(self, task_id, gtb, gtl, gtm, feat_hw):
        """One sample, one task → (heatmap [H,W,K], anno [max_objs, code],
        inds [max_objs], mask [max_objs]). Ref get_targets_single:446-607."""
        Hf, Wf = feat_hw
        names = self.tasks[task_id]['class_names']
        K = len(names)
        base = int(self._cls_base[task_id])
        in_task = gtm & (gtl >= base) & (gtl < base + K)
        local_cls = jnp.clip(gtl - base, 0, K - 1)

        vx, vy = self.voxel_size[:2]
        x0, y0 = self.point_cloud_range[:2]
        f = self.out_size_factor
        cx = (gtb[:, 0] - x0) / vx / f
        cy = (gtb[:, 1] - y0) / vy / f
        in_grid = (cx >= 0) & (cx < Wf) & (cy >= 0) & (cy < Hf)
        ok = in_task & in_grid

        dimw = gtb[:, 3] / vx / f
        diml = gtb[:, 4] / vy / f
        r = gaussian_radius(jnp.stack([diml, dimw], -1),
                            self.gaussian_overlap)
        r = jnp.maximum(self.min_radius, jnp.floor(r))
        centers = jnp.stack([cx, cy], -1)

        # per-class max-combined heatmaps
        def hm_for_class(c):
            return draw_heatmap(Hf, Wf, centers, r, ok & (local_cls == c))
        heatmap = jnp.stack([hm_for_class(c) for c in range(K)], -1)

        G = gtb.shape[0]
        O = self.max_objs
        # top max_objs valid objects (pad otherwise)
        if G >= O:
            sel = jnp.argsort(~ok)[:O]
            om = ok[sel]
        else:
            sel = jnp.pad(jnp.arange(G), (0, O - G))
            om = ok[sel] & (jnp.arange(O) < G)
        b = gtb[sel]
        ix = jnp.clip(jnp.floor(cx[sel]), 0, Wf - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.floor(cy[sel]), 0, Hf - 1).astype(jnp.int32)
        inds = iy * Wf + ix
        dims = jnp.log(jnp.maximum(b[:, 3:6], 1e-4)) if self.norm_bbox \
            else b[:, 3:6]
        anno = [b[:, 0:1] * 0 + (cx[sel] - ix)[:, None],
                (cy[sel] - iy)[:, None],
                b[:, 2:3], dims,
                jnp.sin(b[:, 6:7]), jnp.cos(b[:, 6:7])]
        if self.with_velocity:
            if gtb.shape[-1] < 9:
                raise ValueError(
                    f'with_velocity head needs 9-dim gt boxes '
                    f'(x,y,z,w,l,h,yaw,vx,vy), got {gtb.shape[-1]}-dim — '
                    f'b[:, 7:9] would silently be 0-wide')
            anno.append(b[:, 7:9])
        anno = jnp.concatenate(anno, -1)
        return heatmap, anno, inds, om, local_cls[sel]

    def loss_by_feat(self, outs, gt_bboxes, gt_labels, gt_mask):
        """outs: list (per task) of dicts of NHWC maps; GT padded [B,G,·]."""
        losses = {}
        for tid, task_out in enumerate(outs):
            hm_pred = jax.nn.sigmoid(task_out['heatmap'])
            hm_pred = jnp.clip(hm_pred, 1e-4, 1 - 1e-4)
            B, Hf, Wf, K = hm_pred.shape
            tgt = jax.vmap(lambda b, l, m: self.get_targets_single(
                tid, b, l, m, (Hf, Wf)))(gt_bboxes, gt_labels, gt_mask)
            heatmap, anno, inds, omask, _ = tgt
            num_pos = jnp.maximum(
                jnp.sum((heatmap == 1).astype(jnp.float32)), 1.0)
            l_hm = jnp.sum(gaussian_focal_loss(hm_pred, heatmap)) / num_pos

            # gather predictions at target positions
            parts = [task_out['reg'], task_out['height'], task_out['dim'],
                     task_out['rot']]
            if self.with_velocity and 'vel' in task_out:
                parts.append(task_out['vel'])
            pred = jnp.concatenate(parts, -1)       # [B, H, W, code]
            code = pred.shape[-1]
            pred_flat = pred.reshape(B, Hf * Wf, code)
            pg = jax.vmap(lambda p, i: p[i])(pred_flat, inds)  # [B,O,code]
            cw = jnp.asarray(self.code_weights[:code])
            isnan = jnp.isnan(anno)
            w = omask[..., None].astype(pred.dtype) * (~isnan) * cw
            npos = jnp.maximum(jnp.sum(omask.astype(jnp.float32)), 1.0)
            l_bbox = jnp.sum(l1_loss(pg, jnp.nan_to_num(anno)) * w) / npos
            losses[f'task{tid}.loss_heatmap'] = self.loss_cls_weight * l_hm
            losses[f'task{tid}.loss_bbox'] = self.loss_bbox_weight * l_bbox
        return losses

    # ---------------- prediction -------------------------------------------

    def predict_by_feat(self, outs):
        """→ dict(bboxes [B,N,code], scores, labels, mask) concatenated over
        tasks (fixed shape). Ref predict_by_feat:693-925."""
        results = []
        for tid, task_out in enumerate(outs):
            hm = jax.nn.sigmoid(task_out['heatmap'])
            dim = task_out['dim']
            if self.norm_bbox:
                dim = jnp.exp(dim)
            rot = task_out['rot']
            dec = self._coder.decode(
                hm, rot[..., 0:1], rot[..., 1:2], task_out['height'], dim,
                task_out.get('vel'), task_out['reg'])
            # NMS per sample
            def one(bx, sc, lb, mk):
                if self.nms_type == 'circle':
                    thr = self.min_radius_by_task[tid] \
                        if tid < len(self.min_radius_by_task) \
                        else self.min_radius_by_task[-1]
                    keep = circle_nms_mask(bx[:, :2], sc, mk, thr ** 2)
                else:
                    keep = nms_bev_mask(bx[:, [0, 1, 3, 4, 6]], sc, mk,
                                        self.nms_iou_thr)
                return dict(bboxes=bx, scores=jnp.where(keep, sc, 0.0),
                            labels=lb + int(self._cls_base[tid]),
                            mask=mk & keep)
            results.append(jax.vmap(one)(dec['bboxes'], dec['scores'],
                                         dec['labels'], dec['mask']))
        return {k: jnp.concatenate([r[k] for r in results], axis=1)
                for k in results[0]}
