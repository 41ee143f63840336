"""Rotated-box IoU on TPU: vectorized convex-polygon intersection.

Replaces mmcv's CUDA ``box_iou_rotated`` / ``diff_iou_rotated_3d`` /
``boxes_overlap_bev`` (used by ref mmdet3d/structures/ops/iou3d_calculator.py,
models/losses/rotated_iou_loss.py, task assigners) with a fully-vectorized
XLA implementation.

Algorithm (no sequential polygon clipping): the intersection of two convex
quads is the convex hull of {corners of A inside B} ∪ {corners of B inside A}
∪ {edge-edge intersection points} — at most 4+4+16=24 candidates. We mask
invalid candidates, sort the rest by angle around their centroid, and apply
the shoelace formula. Everything is fixed-shape → vmap over all N×M pairs,
differentiable end to end (also serves RotatedIoULoss).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes3d import corners_bev

_EPS = 1e-8


def _point_in_quad(pts, quad):
    """pts [K,2] inside convex quad [4,2] (corners in consistent order)."""
    a = quad
    b = jnp.roll(quad, -1, axis=0)
    edge = b - a  # [4,2]
    # orientation of the quad
    area2 = jnp.sum(a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1])
    sgn = jnp.sign(area2)
    rel = pts[:, None, :] - a[None, :, :]  # [K,4,2]
    cross = edge[None, :, 0] * rel[..., 1] - edge[None, :, 1] * rel[..., 0]
    return jnp.all(cross * sgn >= -1e-6, axis=-1)


def _seg_intersections(q1, q2):
    """All 16 edge-pair intersection points between two quads.
    Returns pts [16,2], valid [16]."""
    a1 = q1
    b1 = jnp.roll(q1, -1, axis=0)
    a2 = q2
    b2 = jnp.roll(q2, -1, axis=0)
    # broadcast [4,1,...] x [1,4,...]
    d1 = (b1 - a1)[:, None, :]   # [4,1,2]
    d2 = (b2 - a2)[None, :, :]   # [1,4,2]
    ao = a1[:, None, :]
    bo = a2[None, :, :]
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]  # [4,4]
    rel = bo - ao
    t = (rel[..., 0] * d2[..., 1] - rel[..., 1] * d2[..., 0]) / (denom + _EPS)
    u = (rel[..., 0] * d1[..., 1] - rel[..., 1] * d1[..., 0]) / (denom + _EPS)
    valid = (jnp.abs(denom) > _EPS) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = ao + t[..., None] * d1
    return pts.reshape(16, 2), valid.reshape(16)


def _convex_area(cand, valid):
    """Area of convex polygon given candidate vertices + validity mask."""
    n_valid = jnp.sum(valid)
    w = valid.astype(cand.dtype)[:, None]
    center = jnp.sum(cand * w, axis=0) / jnp.maximum(n_valid, 1)
    rel = cand - center
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    ang = jnp.where(valid, ang, jnp.inf)
    order = jnp.argsort(ang)
    v = cand[order]
    vld = valid[order]
    # replace invalid slots (sorted to the end) with the first vertex →
    # zero-area shoelace contributions
    v = jnp.where(vld[:, None], v, v[0])
    nxt = jnp.roll(v, -1, axis=0)
    area = 0.5 * jnp.abs(jnp.sum(v[:, 0] * nxt[:, 1] - nxt[:, 0] * v[:, 1]))
    return jnp.where(n_valid >= 3, area, 0.0)


def _pair_intersection_area_hullsort(q1, q2):
    """Hull-sort variant (kept as the oracle for tests): candidates =
    corners-inside + edge intersections, angular sort, shoelace."""
    in2 = _point_in_quad(q1, q2)
    in1 = _point_in_quad(q2, q1)
    ipts, ivalid = _seg_intersections(q1, q2)
    cand = jnp.concatenate([q1, q2, ipts], axis=0)          # [24,2]
    valid = jnp.concatenate([in2, in1, ivalid], axis=0)      # [24]
    return _convex_area(cand, valid)


def _edge_clip_contrib(a, d, sgn_self, qa, eq, sgn_other,
                       drop_on_boundary):
    """Shoelace contribution of one directed edge p(t)=a+t·d (t∈[0,1]),
    Cyrus–Beck clipped to the inside of the other quad's 4 half-planes.

    qa [4,2] other-quad edge origins; eq [4,2] other-quad edge vectors;
    sgn_other orients "inside = left/right of edge". Parallel-edge
    boundary rule: a segment coincident with an other-quad edge line is
    kept in pass A (drop_on_boundary=False) and dropped in pass B (True)
    so SAME-direction coincident edges are counted exactly once; when the
    coincident edges run in OPPOSITE CCW directions the quads lie on
    opposite sides of the line (abutting boxes — degenerate intersection),
    so the segment is dropped in BOTH passes (advisor r2: abutting unit
    squares previously reported IoU 0.33 instead of 0). Returns the
    origin-based shoelace term ½·cross(p(t0), p(t1)) of the surviving
    sub-segment, oriented by sgn_self (0 if empty)."""
    # f_k(t) = sgn_other·cross(eq_k, a + t·d − qa_k) = alpha_k + t·beta_k
    rel = a[None, :] - qa                                   # [4,2]
    alpha = sgn_other * (eq[:, 0] * rel[:, 1] - eq[:, 1] * rel[:, 0])
    beta = sgn_other * (eq[:, 0] * d[1] - eq[:, 1] * d[0])  # [4]
    tcross = -alpha / jnp.where(jnp.abs(beta) > _EPS, beta, _EPS)
    para = jnp.abs(beta) <= _EPS
    t0 = jnp.max(jnp.where(~para & (beta > 0), tcross, 0.0),
                 initial=0.0)
    t1 = jnp.min(jnp.where(~para & (beta < 0), tcross, 1.0),
                 initial=1.0)
    tol = 1e-6
    outside = para & (alpha < -tol)
    on_bnd = para & (jnp.abs(alpha) <= tol)
    # CCW traversal direction of this edge is sgn_self·d, of the other
    # quad's edge k is sgn_other·eq_k
    same_dir = (sgn_self * sgn_other) \
        * (d[0] * eq[:, 0] + d[1] * eq[:, 1]) > 0
    empty = jnp.any(outside
                    | (on_bnd & (~same_dir | drop_on_boundary))) \
        | (t0 >= t1)
    p0 = a + t0 * d
    p1 = a + t1 * d
    term = 0.5 * (p0[0] * p1[1] - p1[0] * p0[1])
    return jnp.where(empty, 0.0, sgn_self * term)


def _pair_intersection_area(q1, q2):
    """Intersection area of two convex quads [4,2] — SORT-FREE.

    Green's theorem: the boundary of A∩B is (∂A inside B) ∪ (∂B inside
    A); origin-based shoelace terms of the clipped sub-segments sum to
    the area in ANY order, so no hull construction / angular argsort is
    needed (the per-pair argsort cost ~170 ms for a 512² NMS matrix on
    TPU — this formulation is pure vectorized arithmetic).
    """
    def quad_edges(q):
        e = jnp.roll(q, -1, axis=0) - q                     # [4,2]
        area2 = jnp.sum(q[:, 0] * jnp.roll(q, -1, 0)[:, 1]
                        - jnp.roll(q, -1, 0)[:, 0] * q[:, 1])
        return e, jnp.sign(area2)

    e1, s1 = quad_edges(q1)
    e2, s2 = quad_edges(q2)
    # edges of A clipped to inside-B (traversal orientation s1), and
    # edges of B clipped to inside-A (orientation s2); with both
    # oriented CCW the signed sum is +area
    contrib_a = jax.vmap(
        lambda a, d: _edge_clip_contrib(a, d, s1, q2, e2, s2,
                                        False))(q1, e1)
    contrib_b = jax.vmap(
        lambda a, d: _edge_clip_contrib(a, d, s2, q1, e1, s1,
                                        True))(q2, e2)
    return jnp.maximum(jnp.sum(contrib_a) + jnp.sum(contrib_b), 0.0)


def rotated_overlaps_bev(boxes1, boxes2):
    """BEV intersection areas of rotated boxes.

    boxes1 [N,5] (x, y, dx, dy, yaw), boxes2 [M,5] → [N, M] areas.
    """
    def to7(b):
        z = jnp.zeros_like(b[:, :1])
        o = jnp.ones_like(b[:, :1])
        return jnp.concatenate([b[:, 0:1], b[:, 1:2], z, b[:, 2:3],
                                b[:, 3:4], o, b[:, 4:5]], -1)
    q1 = corners_bev(to7(boxes1), jnp)  # [N,4,2]
    q2 = corners_bev(to7(boxes2), jnp)  # [M,4,2]
    f = jax.vmap(jax.vmap(_pair_intersection_area, (None, 0)), (0, None))
    return f(q1, q2)


def rotated_iou_bev(boxes1, boxes2, mode='iou'):
    """Rotated BEV IoU [N, M]. Replaces mmcv box_iou_rotated."""
    inter = rotated_overlaps_bev(boxes1, boxes2)
    a1 = boxes1[:, 2] * boxes1[:, 3]
    a2 = boxes2[:, 2] * boxes2[:, 3]
    if mode == 'iou':
        denom = a1[:, None] + a2[None, :] - inter
    else:  # 'iof'
        denom = a1[:, None] * jnp.ones_like(a2)[None, :]
    return inter / jnp.maximum(denom, _EPS)


def iou_3d(boxes1, boxes2, mode='iou'):
    """Full 3D IoU of 7-DoF boxes (bottom-center origin) [N,M].
    Replaces mmcv diff_iou_rotated_3d / boxes_overlap_bev + height overlap
    (ref iou3d_calculator.py BboxOverlaps3D)."""
    bev1 = boxes1[:, [0, 1, 3, 4, 6]]
    bev2 = boxes2[:, [0, 1, 3, 4, 6]]
    inter_bev = rotated_overlaps_bev(bev1, bev2)
    zlo1, zhi1 = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    zlo2, zhi2 = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    zo = jnp.maximum(
        jnp.minimum(zhi1[:, None], zhi2[None, :])
        - jnp.maximum(zlo1[:, None], zlo2[None, :]), 0.0)
    inter = inter_bev * zo
    v1 = boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5]
    v2 = boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5]
    if mode == 'iou':
        denom = v1[:, None] + v2[None, :] - inter
    else:
        denom = v1[:, None] * jnp.ones_like(v2)[None, :]
    return inter / jnp.maximum(denom, _EPS)


def aligned_iou_bev(boxes1, boxes2):
    """Axis-aligned BEV IoU on (x1,y1,x2,y2) boxes [N,4],[M,4]→[N,M]
    (for nms_normal_bev, ref box3d_nms.py:281-295)."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    a2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    return inter / jnp.maximum(a1[:, None] + a2[None, :] - inter, _EPS)


def nearest_iou_bev(boxes1, boxes2):
    """"Nearest" BEV IoU of 7-DoF boxes: each rotated box is replaced by its
    nearest axis-aligned box (swap dx/dy when |yaw mod pi| > pi/4), then
    aligned IoU. Ref: BboxOverlapsNearest3D + box_np_ops.rbbox2d_to_near_bbox
    (structures/ops/iou3d_calculator.py:14-77, box_np_ops.py).
    boxes [N,7]→[N,M]."""
    def near_aabb(b):
        yaw = b[:, 6] - jnp.floor(b[:, 6] / jnp.pi + 0.5) * jnp.pi  # [-pi/2,pi/2)
        swap = jnp.abs(yaw) > jnp.pi / 4
        dx = jnp.where(swap, b[:, 4], b[:, 3])
        dy = jnp.where(swap, b[:, 3], b[:, 4])
        return jnp.stack([b[:, 0] - dx / 2, b[:, 1] - dy / 2,
                          b[:, 0] + dx / 2, b[:, 1] + dy / 2], -1)
    return aligned_iou_bev(near_aabb(boxes1), near_aabb(boxes2))


def xywhr2xyxyr(boxes):
    """[N,5] (x,y,dx,dy,r) → (x1,y1,x2,y2,r), ref structures/bbox_3d/utils."""
    half = boxes[:, 2:4] * 0.5
    return jnp.concatenate([boxes[:, :2] - half, boxes[:, :2] + half,
                            boxes[:, 4:5]], -1)
