"""Detection losses (functional core + thin config-built wrappers).

TPU-native replacements for the mmdet losses the reference builds from
configs (ref: mmdet FocalLoss / SmoothL1Loss / CrossEntropyLoss used by
mmdet3d/models/dense_heads/anchor3d_head.py and GaussianFocalLoss used by
centerpoint_head.py:609-692). All functions are pure jnp, fixed-shape, and
take explicit element weights — reduction happens with a caller-supplied
``avg_factor`` exactly like mmdet's ``weight``/``avg_factor`` contract.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import MODELS


def _reduce(loss, weight=None, reduction='mean', avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if reduction == 'none':
        return loss
    if reduction == 'sum':
        return jnp.sum(loss)
    # mean
    if avg_factor is None:
        return jnp.mean(loss)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def binary_cross_entropy_with_logits(logits, targets):
    """Numerically-stable elementwise BCE with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def softmax_cross_entropy(logits, labels, num_classes=None):
    """[..., C] logits vs int labels [...]. Elementwise loss [...]."""
    num_classes = num_classes or logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    return -jnp.sum(onehot * logp, axis=-1)


def sigmoid_focal_loss(logits, targets, gamma=2.0, alpha=0.25):
    """Per-element sigmoid focal loss (ref: mmdet FocalLoss semantics).

    Args:
      logits: [..., C]; targets: one-hot [..., C] float (0/1).
    """
    p = jax.nn.sigmoid(logits)
    ce = binary_cross_entropy_with_logits(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def gaussian_focal_loss(pred, gaussian_target, alpha=2.0, gamma=4.0):
    """CornerNet-style focal loss on sigmoid heatmaps (ref: mmdet
    GaussianFocalLoss; used by CenterHead/TransFusion heatmaps).

    pred: [...] probabilities in (0,1); gaussian_target: [...] soft targets
    where 1 marks a positive center.
    """
    eps = 1e-12
    pos_w = (gaussian_target == 1).astype(pred.dtype)
    neg_w = (1 - gaussian_target) ** gamma
    pos_loss = -jnp.log(pred + eps) * (1 - pred) ** alpha * pos_w
    neg_loss = -jnp.log(1 - pred + eps) * pred ** alpha * neg_w * (1 - pos_w)
    return pos_loss + neg_loss


def smooth_l1_loss(pred, target, beta=1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def l1_loss(pred, target):
    return jnp.abs(pred - target)


@MODELS.register_module()
class FocalLoss:
    """Config-built wrapper (ref: mmdet.FocalLoss cfg in anchor3d_head
    configs)."""

    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction='mean', loss_weight=1.0):
        assert use_sigmoid
        self.gamma, self.alpha = gamma, alpha
        self.reduction, self.loss_weight = reduction, loss_weight

    def __call__(self, logits, targets, weight=None, avg_factor=None):
        loss = sigmoid_focal_loss(logits, targets, self.gamma, self.alpha)
        if weight is not None and weight.ndim < loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * _reduce(loss, weight, self.reduction,
                                          avg_factor)


@MODELS.register_module()
class GaussianFocalLoss:
    def __init__(self, alpha=2.0, gamma=4.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha, self.gamma = alpha, gamma
        self.reduction, self.loss_weight = reduction, loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = gaussian_focal_loss(pred, target, self.alpha, self.gamma)
        return self.loss_weight * _reduce(loss, weight, self.reduction,
                                          avg_factor)


@MODELS.register_module()
class SmoothL1Loss:
    def __init__(self, beta=1.0, reduction='mean', loss_weight=1.0):
        self.beta = beta
        self.reduction, self.loss_weight = reduction, loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = smooth_l1_loss(pred, target, self.beta)
        return self.loss_weight * _reduce(loss, weight, self.reduction,
                                          avg_factor)


@MODELS.register_module()
class L1Loss:
    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction, self.loss_weight = reduction, loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * _reduce(l1_loss(pred, target), weight,
                                          self.reduction, avg_factor)


@MODELS.register_module()
class RotatedIoULoss:
    """1 - 3D IoU of rotated boxes (ref: mmdet3d/models/losses/
    rotated_iou_loss.py via mmcv diff_iou_rotated_3d). Our polygon-clip
    IoU (ops/iou3d.iou_3d) is differentiable, so no special kernel."""

    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction, self.loss_weight = reduction, loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        from ...ops.iou3d import iou_3d
        import jax
        iou = jax.vmap(lambda p, t: iou_3d(p[None], t[None])[0, 0])(
            pred, target)
        return self.loss_weight * _reduce(1.0 - iou, weight,
                                          self.reduction, avg_factor)


@MODELS.register_module()
class AxisAlignedIoULoss:
    """1 - IoU of axis-aligned 3D boxes [x1y1z1x2y2z2] (ref:
    axis_aligned_iou_loss.py, used by FCAF3D/indoor heads)."""

    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction, self.loss_weight = reduction, loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        lt = jnp.maximum(pred[..., :3], target[..., :3])
        rb = jnp.minimum(pred[..., 3:6], target[..., 3:6])
        inter = jnp.prod(jnp.maximum(rb - lt, 0.0), -1)
        v1 = jnp.prod(jnp.maximum(pred[..., 3:6] - pred[..., :3], 0), -1)
        v2 = jnp.prod(jnp.maximum(target[..., 3:6] - target[..., :3], 0),
                      -1)
        iou = inter / jnp.maximum(v1 + v2 - inter, 1e-8)
        return self.loss_weight * _reduce(1.0 - iou, weight,
                                          self.reduction, avg_factor)


@MODELS.register_module()
class UncertainSmoothL1Loss:
    """Smooth-L1 with learned aleatoric uncertainty (ref:
    uncertain_smooth_l1_loss.py, used by PGD depth)."""

    def __init__(self, alpha=1.0, beta=1.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha, self.beta = alpha, beta
        self.reduction, self.loss_weight = reduction, loss_weight

    def __call__(self, pred, target, sigma, weight=None, avg_factor=None):
        loss = jnp.exp(-sigma) * smooth_l1_loss(pred, target, self.beta) \
            + self.alpha * sigma
        return self.loss_weight * _reduce(loss, weight, self.reduction,
                                          avg_factor)


def chamfer_distance(src, dst, src_mask=None, dst_mask=None):
    """Bidirectional chamfer over padded point sets [N,3]/[M,3]
    (ref: chamfer_distance.py, VoteNet center loss)."""
    d2 = jnp.sum((src[:, None] - dst[None]) ** 2, -1)
    if dst_mask is not None:
        d2 = jnp.where(dst_mask[None], d2, jnp.inf)
    fwd = jnp.min(d2, -1)
    if src_mask is not None:
        fwd = jnp.where(src_mask, fwd, 0.0)
        n_src = jnp.maximum(jnp.sum(src_mask), 1)
    else:
        n_src = src.shape[0]
    d2b = d2 if src_mask is None else jnp.where(src_mask[:, None], d2,
                                                jnp.inf)
    bwd = jnp.min(d2b, 0)
    if dst_mask is not None:
        bwd = jnp.where(dst_mask, bwd, 0.0)
        n_dst = jnp.maximum(jnp.sum(dst_mask), 1)
    else:
        n_dst = dst.shape[0]
    return jnp.sum(fwd) / n_src, jnp.sum(bwd) / n_dst


@MODELS.register_module()
class CrossEntropyLoss:
    def __init__(self, use_sigmoid=False, reduction='mean', loss_weight=1.0):
        self.use_sigmoid = use_sigmoid
        self.reduction, self.loss_weight = reduction, loss_weight

    def __call__(self, logits, labels, weight=None, avg_factor=None):
        if self.use_sigmoid:
            loss = binary_cross_entropy_with_logits(
                logits, labels.astype(logits.dtype))
        else:
            loss = softmax_cross_entropy(logits, labels)
        return self.loss_weight * _reduce(loss, weight, self.reduction,
                                          avg_factor)


def lovasz_softmax_loss(logits, labels, valid, ignore_index: int = 255):
    """Masked fixed-shape Lovasz-softmax (ref mmseg LovaszLoss as used by
    the Cylinder3D recipe; Berman et al. 2018).

    logits [..., K]; labels [...] int; valid [...] bool. Invalid rows get
    error 0 so they sort last and contribute nothing; classes absent from
    the batch are skipped ('present' mode).
    """
    K = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).reshape(-1, K)
    lab = labels.reshape(-1)
    v = valid.reshape(-1) & (lab != ignore_index)
    lab = jnp.clip(lab, 0, K - 1)

    def per_class(c):
        fg = ((lab == c) & v).astype(jnp.float32)
        err = jnp.abs(fg - probs[:, c]) * v.astype(jnp.float32)
        order = jnp.argsort(-err)
        fg_s = fg[order]
        err_s = err[order]
        gts = jnp.sum(fg_s)
        inter = gts - jnp.cumsum(fg_s)
        union = gts + jnp.cumsum(1.0 - fg_s)
        jacc = 1.0 - inter / jnp.maximum(union, 1.0)
        grad = jnp.concatenate([jacc[:1], jacc[1:] - jacc[:-1]])
        return jnp.sum(err_s * grad), (gts > 0).astype(jnp.float32)

    losses, present = jax.vmap(per_class)(jnp.arange(K))
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)
