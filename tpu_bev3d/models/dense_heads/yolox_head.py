"""YOLOX auxiliary 2D head with SimOTA assignment (+ centers2d branch).

Rebuild of the reference StreamPETR aux 2D detector
(ref: projects/StreamPETR/stream_petr/models/dense_heads/yolox_head.py:21
YOLOXHeadCustom — a mmdet YOLOXHead extended with a per-prior centers2d
offset branch whose decoded centers seed 2D object priors for the 3D
decoder) and of the mmdet SimOTA assigner it trains with.

TPU design notes
- Fixed shapes end to end: priors are the concatenated multi-level grid
  (static), GT come in as padded [G, ...] slots with a validity mask, and
  SimOTA is a dense [P, G] cost problem solved with sorts/top-k instead of
  data-dependent index lists. Losses are mask-weighted sums, so the whole
  loss is one jittable graph.
- SimOTA (mmdet task_modules/assigners/sim_ota_assigner.py semantics):
  cost = BCE(sqrt(cls_prob * obj_prob), onehot) + 3 * (-log IoU)
  + 1e5 * not(center in GT box AND in center radius); per-GT dynamic-k =
  clamp(sum of top-10 IoUs, >= 1); prior conflicts resolved by min cost.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS

INF_COST = 1e5


def iou_2d(a, b, eps=1e-7):
    """Pairwise IoU of xyxy boxes: a [P,4], b [G,4] -> [P,G]."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None] - inter, eps)


def _elementwise_iou_2d(a, b, eps=1e-7):
    """Elementwise IoU of xyxy boxes with matching leading dims."""
    tl = jnp.maximum(a[..., :2], b[..., :2])
    br = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(br - tl, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (jnp.clip(a[..., 2] - a[..., 0], 0)
              * jnp.clip(a[..., 3] - a[..., 1], 0))
    area_b = (jnp.clip(b[..., 2] - b[..., 0], 0)
              * jnp.clip(b[..., 3] - b[..., 1], 0))
    return inter / jnp.maximum(area_a + area_b - inter, eps)


def simota_assign(cls_prob, obj_prob, priors, decoded, gt_boxes, gt_labels,
                  gt_mask, num_classes, candidate_topk=10,
                  center_radius=2.5):
    """Fixed-shape SimOTA for ONE image.

    cls_prob [P,C] sigmoid scores, obj_prob [P], priors [P,4]
    (cx, cy, stride, stride), decoded [P,4] xyxy, gt_boxes [G,4] xyxy,
    gt_labels [G], gt_mask [G] -> (fg_mask [P], matched_gt [P] int,
    matched_iou [P]).
    """
    P, G = priors.shape[0], gt_boxes.shape[0]
    cx, cy = priors[:, 0], priors[:, 1]
    stride = priors[:, 2]
    # center-prior gating (mmdet SimOTA is_in_gts_or_centers)
    in_gt = ((cx[:, None] >= gt_boxes[None, :, 0])
             & (cx[:, None] <= gt_boxes[None, :, 2])
             & (cy[:, None] >= gt_boxes[None, :, 1])
             & (cy[:, None] <= gt_boxes[None, :, 3]))
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    r = center_radius * stride[:, None]
    in_ctr = ((cx[:, None] >= gcx[None] - r) & (cx[:, None] <= gcx[None] + r)
              & (cy[:, None] >= gcy[None] - r)
              & (cy[:, None] <= gcy[None] + r))
    valid = (in_gt | in_ctr) & gt_mask[None, :]
    both = in_gt & in_ctr

    ious = iou_2d(decoded, gt_boxes)                        # [P, G]
    iou_cost = -jnp.log(ious + 1e-8)
    onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0), num_classes)  # [G, C]
    joint = jnp.sqrt(jnp.clip(cls_prob * obj_prob[:, None], 1e-8, 1.0))
    # BCE(joint, onehot) summed over classes, pairwise [P, G]
    bce = -(onehot[None] * jnp.log(joint[:, None])
            + (1 - onehot[None]) * jnp.log(jnp.clip(1 - joint[:, None],
                                                    1e-8)))
    cls_cost = bce.sum(-1)
    cost = (cls_cost + 3.0 * iou_cost
            + INF_COST * (~both).astype(cls_cost.dtype)
            + 2 * INF_COST * (~valid).astype(cls_cost.dtype))

    # dynamic-k per GT from the top-10 IoUs among valid priors
    iou_v = jnp.where(valid, ious, 0.0)
    topk_ious = jax.lax.top_k(iou_v.T, min(candidate_topk, P))[0]  # [G, k]
    ks = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 1, None)
    ks = jnp.where(gt_mask, ks, 0)

    # per-GT: mark the ks[g] lowest-cost priors -> rank via argsort
    order = jnp.argsort(cost, axis=0)                       # [P, G]
    rank = jnp.argsort(order, axis=0)                       # rank of each prior
    matching = (rank < ks[None, :]) & valid                 # [P, G]
    # conflicts: prior matched to >1 GT keeps the min-cost GT
    n_match = matching.sum(-1)
    best_gt = jnp.argmin(jnp.where(matching, cost, jnp.inf), axis=-1)
    matching = jnp.where(
        (n_match > 1)[:, None],
        jax.nn.one_hot(best_gt, G, dtype=bool) & matching, matching)
    fg = matching.any(-1)
    matched_gt = jnp.where(fg, jnp.argmax(matching, -1), 0)
    matched_iou = jnp.take_along_axis(ious, matched_gt[:, None], 1)[:, 0]
    return fg, matched_gt, matched_iou * fg


@MODELS.register_module()
class YOLOXHead2D(nn.Module):
    """Multi-level YOLOX head over per-camera image features.

    Branches per level (ref yolox_head.py:122-193): stacked 3x3 convs for
    cls and reg towers, then 1x1 predictors for class logits [C], bbox
    (dx, dy, logw, logh), objectness [1], and centers2d offset [2]. The
    decoded centers2d (ref :236-238 — offset * stride + prior) are the 2D
    object-center priors consumed by the 3D head.
    """
    num_classes: int = 10
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    strides: Tuple[int, ...] = (8, 16, 32)
    # instance masks (nuImages parity — the reference trains mask R-CNN
    # style models on the nuimage converter's COCO masks, ref
    # configs/nuimages/*): >0 enables a YOLACT-style prototype branch —
    # k prototypes from the finest level + per-prior coefficients; a
    # predicted mask is sigmoid(protos @ coefs), cropped to its box.
    # Fixed shapes: [BN, Hp, Wp, k] protos, [BN, P, k] coefs — one
    # einsum per image lands the mask matmul on the MXU.
    mask_channels: int = 0
    mask_pos_topk: int = 32      # positives supervised per image

    def _tower(self, x, prefix, train):
        for i in range(self.stacked_convs):
            x = nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                        use_bias=False, name=f'{prefix}_conv{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                             epsilon=1e-3, name=f'{prefix}_bn{i}')(x)
            x = nn.swish(x)
        return x

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: list of [B*N, H_l, W_l, C] maps (one per stride).

        -> dict(cls [BN,P,C], bbox_raw [BN,P,4], obj [BN,P],
        centers2d_off [BN,P,2], priors [P,4], bboxes [BN,P,4] decoded xyxy,
        centers2d [BN,P,2] decoded).
        """
        all_cls, all_reg, all_obj, all_ctr, all_priors = [], [], [], [], []
        all_mc = []
        for li, (x, s) in enumerate(zip(feats, self.strides)):
            BN, H, W, _ = x.shape
            c = self._tower(x, f'cls{li}', train)
            r = self._tower(x, f'reg{li}', train)
            cls = nn.Conv(self.num_classes, (1, 1), name=f'pred_cls{li}')(c)
            reg = nn.Conv(4, (1, 1), name=f'pred_reg{li}')(r)
            obj = nn.Conv(1, (1, 1), name=f'pred_obj{li}')(r)
            ctr = nn.Conv(2, (1, 1), name=f'pred_ctr{li}')(r)
            all_cls.append(cls.reshape(BN, H * W, -1))
            all_reg.append(reg.reshape(BN, H * W, 4))
            all_obj.append(obj.reshape(BN, H * W))
            all_ctr.append(ctr.reshape(BN, H * W, 2))
            if self.mask_channels > 0:
                mc = nn.Conv(self.mask_channels, (1, 1),
                             name=f'pred_mcoef{li}')(r)
                all_mc.append(jnp.tanh(mc).reshape(BN, H * W, -1))
            ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                                  jnp.arange(W, dtype=jnp.float32),
                                  indexing='ij')
            pri = jnp.stack([xs.reshape(-1) * s, ys.reshape(-1) * s,
                             jnp.full((H * W,), float(s)),
                             jnp.full((H * W,), float(s))], -1)
            all_priors.append(pri)
        cls = jnp.concatenate(all_cls, 1).astype(jnp.float32)
        reg = jnp.concatenate(all_reg, 1).astype(jnp.float32)
        obj = jnp.concatenate(all_obj, 1).astype(jnp.float32)
        ctr = jnp.concatenate(all_ctr, 1).astype(jnp.float32)
        priors = jnp.concatenate(all_priors, 0)
        # decode (ref _bbox_decode:224-234): xy = off*stride + prior,
        # wh = exp(raw)*stride
        xy = reg[..., :2] * priors[None, :, 2:] + priors[None, :, :2]
        wh = jnp.exp(jnp.clip(reg[..., 2:], -10, 8)) * priors[None, :, 2:]
        bboxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
        centers2d = ctr * priors[None, :, 2:] + priors[None, :, :2]
        out = dict(cls=cls, bbox_raw=reg, obj=obj, centers2d_off=ctr,
                   priors=priors, bboxes=bboxes, centers2d=centers2d)
        if self.mask_channels > 0:
            # prototype net over the finest level (YOLACT protonet shape)
            p = feats[0]
            for i in range(2):
                p = nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                            name=f'proto_conv{i}')(p)
                p = nn.relu(p)
            p = nn.Conv(self.mask_channels, (1, 1), name='proto_pred')(p)
            out['protos'] = nn.relu(p)           # [BN, Hp, Wp, k]
            out['mask_coefs'] = jnp.concatenate(all_mc, 1)  # [BN, P, k]
            out['proto_stride'] = float(self.strides[0])
        return out

    @staticmethod
    def crop_masks(masks, boxes, stride):
        """Zero mask logits/probs outside their (image-pixel) boxes.

        masks [..., Q, Hp, Wp], boxes [..., Q, 4] xyxy pixels; YOLACT's
        crop — implemented as a broadcast compare (no dynamic slicing).
        """
        Hp, Wp = masks.shape[-2:]
        ys = (jnp.arange(Hp, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(Wp, dtype=jnp.float32) + 0.5) * stride
        b = boxes[..., None, None, :]
        inside = ((xs[None, :] >= b[..., 0]) & (xs[None, :] <= b[..., 2])
                  & (ys[:, None] >= b[..., 1]) & (ys[:, None] <= b[..., 3]))
        return masks * inside.astype(masks.dtype)

    def loss_by_feat(self, outs, gt_bboxes, gt_labels, centers2d, gt_mask,
                     gt_masks=None):
        """All-image SimOTA targets + mask-weighted YOLOX losses.

        gt_bboxes [BN,G,4] xyxy (image pixels), gt_labels [BN,G],
        centers2d [BN,G,2] projected 3D centers, gt_mask [BN,G].
        Ref loss (yolox_head.py:254-355): cls BCE(pos, iou-scaled onehot),
        obj BCE(all), IoU loss(pos), L1 on (dxy, logwh)(pos), centers2d
        L1(pos); all sum-reduced / num_pos.
        """
        priors = outs['priors']

        def one(cls, obj, dec, gtb, gtl, c2d, gtm):
            fg, mgt, miou = simota_assign(
                jax.nn.sigmoid(cls), jax.nn.sigmoid(obj), priors, dec,
                gtb, gtl, gtm, self.num_classes)
            return fg, mgt, miou

        fg, mgt, miou = jax.vmap(one)(
            outs['cls'], outs['obj'], outs['bboxes'], gt_bboxes,
            gt_labels, centers2d, gt_mask)
        num_pos = jnp.maximum(fg.sum(), 1.0)

        tgt_boxes = jnp.take_along_axis(
            gt_bboxes, mgt[..., None], 1)                       # [BN,P,4]
        tgt_labels = jnp.take_along_axis(gt_labels, mgt, 1)
        tgt_ctr = jnp.take_along_axis(centers2d, mgt[..., None], 1)

        onehot = jax.nn.one_hot(jnp.clip(tgt_labels, 0), self.num_classes)
        cls_tgt = onehot * miou[..., None]
        p = jax.nn.sigmoid(outs['cls'])
        bce_cls = -(cls_tgt * jnp.log(jnp.clip(p, 1e-8))
                    + (1 - cls_tgt) * jnp.log(jnp.clip(1 - p, 1e-8)))
        loss_cls = jnp.sum(bce_cls * fg[..., None]) / num_pos

        obj_p = jax.nn.sigmoid(outs['obj'])
        bce_obj = -(fg * jnp.log(jnp.clip(obj_p, 1e-8))
                    + (~fg) * jnp.log(jnp.clip(1 - obj_p, 1e-8)))
        loss_obj = jnp.sum(bce_obj) / num_pos

        ious = _elementwise_iou_2d(outs['bboxes'], tgt_boxes)
        loss_iou = 5.0 * jnp.sum((1.0 - ious ** 2) * fg) / num_pos

        # L1 on raw offsets (ref _get_l1_target:428-433)
        gcx = (tgt_boxes[..., 0] + tgt_boxes[..., 2]) / 2
        gcy = (tgt_boxes[..., 1] + tgt_boxes[..., 3]) / 2
        gw = jnp.clip(tgt_boxes[..., 2] - tgt_boxes[..., 0], 1e-3)
        gh = jnp.clip(tgt_boxes[..., 3] - tgt_boxes[..., 1], 1e-3)
        l1_tgt = jnp.stack(
            [(gcx - priors[None, :, 0]) / priors[None, :, 2],
             (gcy - priors[None, :, 1]) / priors[None, :, 3],
             jnp.log(gw / priors[None, :, 2] + 1e-8),
             jnp.log(gh / priors[None, :, 3] + 1e-8)], -1)
        loss_l1 = jnp.sum(jnp.abs(outs['bbox_raw'] - l1_tgt)
                          * fg[..., None]) / num_pos

        ctr_tgt = (tgt_ctr - priors[None, :, :2]) / priors[None, :, 2:]
        loss_ctr = jnp.sum(jnp.abs(outs['centers2d_off'] - ctr_tgt)
                           * fg[..., None]) / num_pos
        losses = dict(enc_loss_cls=loss_cls, enc_loss_obj=loss_obj,
                      enc_loss_iou=loss_iou, enc_loss_l1=loss_l1,
                      enc_loss_centers2d=loss_ctr)
        if gt_masks is not None and self.mask_channels > 0:
            losses['enc_loss_mask'] = self._mask_loss(
                outs, fg, mgt, miou, gt_bboxes, gt_masks)
        return losses

    def _mask_loss(self, outs, fg, mgt, miou, gt_bboxes, gt_masks):
        """YOLACT-style prototype mask loss on the top positives.

        gt_masks [BN, G, Hm, Wm] binary (any resolution — resized to the
        prototype grid); BCE-with-logits inside each GT box, normalized
        by box area (YOLACT's loss), averaged over supervised positives.
        Only ``mask_pos_topk`` positives per image are supervised — a
        fixed shape that keeps the [Q, Hp, Wp] tensor small for jit.
        """
        protos = outs['protos']                            # [BN, Hp, Wp, k]
        stride = outs['proto_stride']
        BN, Hp, Wp, _ = protos.shape
        Km = self.mask_pos_topk
        # deterministic positive selection: prefer higher matched IoU
        sel_score = fg.astype(jnp.float32) * (1.0 + miou)
        sw, sel = jax.lax.top_k(sel_score, Km)             # [BN, Km]
        sel_valid = sw > 0.0
        coefs = jnp.take_along_axis(outs['mask_coefs'], sel[..., None], 1)
        sgt = jnp.take_along_axis(mgt, sel, 1)             # [BN, Km]
        boxes = jnp.take_along_axis(gt_bboxes, sgt[..., None], 1)
        logits = jnp.einsum('bhwk,bqk->bqhw', protos, coefs)
        if gt_masks.shape[-2:] != (Hp, Wp):
            gt_masks = jax.image.resize(
                gt_masks.astype(jnp.float32),
                gt_masks.shape[:-2] + (Hp, Wp), 'nearest')
        tgt = jnp.take_along_axis(
            gt_masks.astype(jnp.float32),
            sgt[..., None, None].repeat(Hp, -2).repeat(Wp, -1), 1)
        bce = (jnp.clip(logits, 0) - logits * tgt
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        bce = self.crop_masks(bce, boxes, stride)          # in-box only
        area = jnp.clip((boxes[..., 2] - boxes[..., 0])
                        * (boxes[..., 3] - boxes[..., 1])
                        / (stride * stride), 1.0)
        per_inst = bce.sum((-2, -1)) / area                # [BN, Km]
        n = jnp.maximum(sel_valid.sum(), 1.0)
        return jnp.sum(per_inst * sel_valid) / n

    def top_priors(self, outs, num_priors: int):
        """Top-k 2D object priors for the 3D decoder (repdetr flow):
        -> (centers2d [BN,k,2] pixels, scores [BN,k], prior_idx [BN,k])."""
        score = (jax.nn.sigmoid(outs['cls']).max(-1)
                 * jax.nn.sigmoid(outs['obj']))
        top, idx = jax.lax.top_k(score, num_priors)
        ctr = jnp.take_along_axis(outs['centers2d'], idx[..., None], 1)
        return ctr, top, idx
