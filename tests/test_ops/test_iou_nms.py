"""Golden tests for rotated IoU and NMS against shapely/numpy references."""
import numpy as np
import pytest

from tpu_bev3d.ops.iou3d import (aligned_iou_bev, iou_3d, rotated_iou_bev,
                                 rotated_overlaps_bev)
from tpu_bev3d.ops.nms import (box3d_multiclass_nms, circle_nms_mask,
                               nms_bev_mask, nms_normal_bev_mask)


def np_rotated_corners(b):
    x, y, dx, dy, r = b
    c, s = np.cos(r), np.sin(r)
    lx = np.array([dx, dx, -dx, -dx]) * 0.5
    ly = np.array([-dy, dy, dy, -dy]) * 0.5
    return np.stack([lx * c - ly * s + x, lx * s + ly * c + y], -1)


def np_poly_area_intersection(b1, b2):
    """Reference intersection via dense rasterization (robust, slow)."""
    q1, q2 = np_rotated_corners(b1), np_rotated_corners(b2)
    allpts = np.concatenate([q1, q2])
    lo, hi = allpts.min(0) - 0.1, allpts.max(0) + 0.1
    n = 400
    xs = np.linspace(lo[0], hi[0], n)
    ys = np.linspace(lo[1], hi[1], n)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], -1)

    def inside(q, p):
        a, bb = q, np.roll(q, -1, 0)
        e = bb - a
        sgn = np.sign(np.sum(a[:, 0] * bb[:, 1] - bb[:, 0] * a[:, 1]))
        rel = p[:, None, :] - a[None]
        cr = e[None, :, 0] * rel[..., 1] - e[None, :, 1] * rel[..., 0]
        return np.all(cr * sgn >= 0, -1)

    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    return np.sum(inside(q1, pts) & inside(q2, pts)) * cell


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_rotated_overlap_matches_rasterized(seed):
    rng = np.random.default_rng(seed)
    b1 = np.stack([rng.uniform(-1, 1, 5) * [2, 2, 0, 0, 0]
                   + [0, 0, 2, 3, 0] + rng.uniform(0, 1, 5) * [0, 0, 1, 1, 3]
                   for _ in range(4)]).astype(np.float32)
    b2 = np.stack([rng.uniform(-1, 1, 5) * [2, 2, 0, 0, 0]
                   + [0, 0, 2, 2, 0] + rng.uniform(0, 1, 5) * [0, 0, 1, 1, 3]
                   for _ in range(3)]).astype(np.float32)
    got = np.asarray(rotated_overlaps_bev(b1, b2))
    for i in range(4):
        for j in range(3):
            want = np_poly_area_intersection(b1[i], b2[j])
            assert abs(got[i, j] - want) < 0.05, (i, j, got[i, j], want)


def test_identical_boxes_iou_one():
    b = np.array([[1.0, 2.0, 3.0, 4.0, 0.7]], np.float32)
    iou = np.asarray(rotated_iou_bev(b, b))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-4)


def test_disjoint_boxes_iou_zero():
    b1 = np.array([[0.0, 0.0, 1.0, 1.0, 0.3]], np.float32)
    b2 = np.array([[10.0, 10.0, 1.0, 1.0, 1.2]], np.float32)
    np.testing.assert_allclose(np.asarray(rotated_iou_bev(b1, b2)), [[0.0]],
                               atol=1e-6)


def test_axis_aligned_special_case():
    # two unit squares overlapping by half, no rotation
    b1 = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]], np.float32)
    b2 = np.array([[0.5, 0.0, 1.0, 1.0, 0.0]], np.float32)
    np.testing.assert_allclose(np.asarray(rotated_iou_bev(b1, b2)),
                               [[0.5 / 1.5]], atol=1e-5)


def test_iou3d():
    # unit cubes stacked with half z-overlap, same footprint
    b1 = np.array([[0, 0, 0.0, 1, 1, 1, 0.0]], np.float32)
    b2 = np.array([[0, 0, 0.5, 1, 1, 1, 0.0]], np.float32)
    np.testing.assert_allclose(np.asarray(iou_3d(b1, b2)), [[0.5 / 1.5]],
                               atol=1e-5)


def np_greedy_nms(ious, scores, valid, thr):
    order = np.argsort(-np.where(valid, scores, -np.inf))
    keep = []
    for i in order:
        if not valid[i]:
            continue
        if all(ious[k, i] <= thr for k in keep):
            keep.append(i)
    mask = np.zeros(len(scores), bool)
    mask[keep] = True
    return mask


def test_nms_bev_matches_numpy(rng):
    N = 30
    boxes = np.stack([
        rng.uniform(0, 10, N), rng.uniform(0, 10, N),
        rng.uniform(1, 3, N), rng.uniform(1, 3, N),
        rng.uniform(-np.pi, np.pi, N)], -1).astype(np.float32)
    scores = rng.uniform(size=N).astype(np.float32)
    valid = rng.uniform(size=N) > 0.2
    got = np.asarray(nms_bev_mask(boxes, scores, valid, 0.3))
    ious = np.asarray(rotated_iou_bev(boxes, boxes))
    want = np_greedy_nms(ious, scores, valid, 0.3)
    np.testing.assert_array_equal(got, want)


def test_circle_nms(rng):
    N = 20
    centers = rng.uniform(0, 10, (N, 2)).astype(np.float32)
    scores = rng.uniform(size=N).astype(np.float32)
    valid = np.ones(N, bool)
    radius = 4.0  # squared-distance threshold, matching ref circle_nms
    got = np.asarray(circle_nms_mask(centers, scores, valid, radius))
    d2 = np.sum((centers[:, None] - centers[None]) ** 2, -1)
    order = np.argsort(-scores)
    keep = []
    for i in order:
        if all(d2[k, i] >= radius for k in keep):
            keep.append(i)
    want = np.zeros(N, bool)
    want[keep] = True
    np.testing.assert_array_equal(got, want)


def test_multiclass_nms_shapes(rng):
    N, C, box_dim = 50, 3, 7
    bboxes = rng.uniform(0, 10, (N, box_dim)).astype(np.float32)
    bev = np.concatenate([bboxes[:, :2], np.abs(bboxes[:, 3:5]) + 0.5,
                          bboxes[:, 6:7]], -1).astype(np.float32)
    scores = rng.uniform(size=(N, C)).astype(np.float32)
    out = box3d_multiclass_nms(bboxes, bev, scores, score_thr=0.3,
                               iou_thr=0.3, max_out=20)
    assert out['bboxes'].shape == (20, box_dim)
    assert out['scores'].shape == (20,)
    mask = np.asarray(out['mask'])
    labels = np.asarray(out['labels'])
    assert np.all(labels[mask] >= 0) and np.all(labels[mask] < C)
    assert np.all(np.asarray(out['scores'])[mask] > 0.3)
    # scores sorted descending among valid
    s = np.asarray(out['scores'])[mask]
    assert np.all(np.diff(s) <= 1e-6)


def test_sortfree_area_matches_hullsort_oracle():
    """The Green's-theorem edge-clip area (sort-free, TPU-fast) must
    agree with the hull-sort construction on random rotated pairs,
    including identical boxes (coincident boundaries count once),
    containment, and disjoint pairs."""
    import jax
    import jax.numpy as jnp
    from tpu_bev3d.ops.iou3d import (_pair_intersection_area,
                                     _pair_intersection_area_hullsort,
                                     rotated_iou_bev)
    from tpu_bev3d.structures.boxes3d import corners_bev

    rng = np.random.default_rng(0)
    n = 200
    b = np.zeros((n, 7), np.float32)
    b[:, :2] = rng.uniform(-5, 5, (n, 2))
    b[:, 3:5] = rng.uniform(0.5, 4.0, (n, 2))
    b[:, 5] = 1.0
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    q = corners_bev(jnp.asarray(b), jnp)                 # [n,4,2]
    f_new = jax.vmap(_pair_intersection_area)
    f_old = jax.vmap(_pair_intersection_area_hullsort)
    i = rng.integers(0, n, 400)
    j = rng.integers(0, n, 400)
    a_new = np.asarray(f_new(q[i], q[j]))
    a_old = np.asarray(f_old(q[i], q[j]))
    np.testing.assert_allclose(a_new, a_old, rtol=1e-3, atol=1e-3)
    # identical boxes → own area exactly once
    a_self = np.asarray(f_new(q[:20], q[:20]))
    np.testing.assert_allclose(a_self, b[:20, 3] * b[:20, 4],
                               rtol=1e-4, atol=1e-4)
    # containment: big box contains small co-centered box
    big = b[:10].copy(); big[:, 3:5] *= 4
    qb = corners_bev(jnp.asarray(big), jnp)
    a_cont = np.asarray(f_new(qb, q[:10]))
    np.testing.assert_allclose(a_cont, b[:10, 3] * b[:10, 4],
                               rtol=1e-4, atol=1e-4)
    # disjoint
    far = b[:10].copy(); far[:, 0] += 100
    qf = corners_bev(jnp.asarray(far), jnp)
    np.testing.assert_allclose(np.asarray(f_new(q[:10], qf)), 0.0,
                               atol=1e-6)
    # full IoU matrix symmetric-ish and in [0, 1]
    iou = np.asarray(rotated_iou_bev(jnp.asarray(b[:, [0, 1, 3, 4, 6]]),
                                     jnp.asarray(b[:, [0, 1, 3, 4, 6]])))
    assert (iou >= -1e-6).all() and (iou <= 1 + 1e-5).all()
    np.testing.assert_allclose(iou, iou.T, atol=2e-3)
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)

    # abutting boxes sharing an edge (advisor r2: opposite-direction
    # coincident edges gave spurious area 0.5 → IoU 0.33; must be 0)
    ab = np.asarray([[0.5, 0.5, 0.0, 1.0, 1.0, 1.0, 0.0],   # [0,1]²
                     [1.5, 0.5, 0.0, 1.0, 1.0, 1.0, 0.0],   # [1,2]²
                     [0.5, 1.5, 0.0, 1.0, 1.0, 1.0, 0.0],   # [0,1]x[1,2]
                     [0.5, 0.5, 0.0, 1.0, 1.0, 1.0, np.pi]],
                    np.float32)                              # [0,1]² rot180
    qab = corners_bev(jnp.asarray(ab), jnp)
    # x-abutting and y-abutting: zero intersection both orders
    for i_, j_ in [(0, 1), (1, 0), (0, 2), (2, 0)]:
        np.testing.assert_allclose(
            float(_pair_intersection_area(qab[i_], qab[j_])), 0.0,
            atol=1e-5)
    # pi-rotated identical box: coincident edges on ALL sides with
    # relabeled corners — must still count each boundary exactly once
    np.testing.assert_allclose(
        float(_pair_intersection_area(qab[0], qab[3])), 1.0, rtol=1e-4)
    # corner-touching diagonal neighbor: zero
    cb = np.asarray([[1.5, 1.5, 0.0, 1.0, 1.0, 1.0, 0.0]], np.float32)
    qcb = corners_bev(jnp.asarray(cb), jnp)
    np.testing.assert_allclose(
        float(_pair_intersection_area(qab[0], qcb[0])), 0.0, atol=1e-5)
