"""PointNet++ op family: numeric golden tests vs numpy references."""
import numpy as np

import jax.numpy as jnp

from tpu_bev3d.ops.pointnet_ops import (ball_query, furthest_point_sample,
                                        gather_points, grouping_operation,
                                        three_interpolate, three_nn)


def test_fps_spread_and_mask(rng):
    pts = rng.uniform(-10, 10, (128, 3)).astype(np.float32)
    mask = np.ones(128, bool)
    mask[100:] = False
    idx = np.asarray(furthest_point_sample(jnp.asarray(pts),
                                           jnp.asarray(mask), 16))
    assert len(set(idx.tolist())) == 16      # distinct
    assert (idx < 100).all()                  # never picks padding
    # FPS should cover better than random: min pairwise distance of the
    # chosen set should exceed that of the first 16 points
    def min_pd(p):
        d = np.linalg.norm(p[:, None] - p[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()
    assert min_pd(pts[idx]) > min_pd(pts[:16])


def test_ball_query_radius(rng):
    pts = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    mask = np.ones(256, bool)
    centers = pts[:4]
    idx, valid = ball_query(jnp.asarray(centers), jnp.asarray(pts),
                            jnp.asarray(mask), 1.0, 8)
    idx, valid = np.asarray(idx), np.asarray(valid)
    for s in range(4):
        d = np.linalg.norm(pts[idx[s]] - centers[s], axis=-1)
        assert (d[valid[s]] <= 1.0 + 1e-5).all()
        # center itself is within its own ball
        assert valid[s, 0]
    g = np.asarray(grouping_operation(jnp.asarray(pts), jnp.asarray(idx)))
    assert g.shape == (4, 8, 3)


def test_three_nn_interpolate_exact(rng):
    known = rng.uniform(-5, 5, (32, 3)).astype(np.float32)
    feats = rng.normal(size=(32, 16)).astype(np.float32)
    kmask = np.ones(32, bool)
    # unknown points exactly at known locations → interpolation returns
    # the exact feature
    unknown = known[:8]
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known),
                         jnp.asarray(kmask))
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, dist))
    assert np.allclose(out, feats[:8], atol=1e-4)
    assert np.asarray(gather_points(jnp.asarray(feats),
                                    jnp.asarray([3, 5]))).shape == (2, 16)
