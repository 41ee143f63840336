"""PointNet++ op family on TPU (N8 in SURVEY §2.1).

Replaces the mmcv CUDA ops ``furthest_point_sample, gather_points,
ball_query, grouping_operation, three_nn, three_interpolate`` used by the
reference's point-based models (ref imports:
mmdet3d/models/layers/pointnet_modules/point_sa_module.py,
point_fp_module.py).

TPU design: all fixed-shape, vectorized XLA —
- FPS: ``lax.fori_loop`` maintaining a running min-distance vector; each
  iteration is one [P]-wide update (the classic O(S·P) formulation).
- ball query: full [S, P] pairwise distances + top-k by masked distance
  (P ≤ ~16k for every reference config — the distance matrix is small
  next to a BEV canvas).
- three_nn/interpolate: top-3 smallest distances + inverse-distance
  weights; pure gathers.
Padding: invalid points carry mask=False and are pushed to +inf distance.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('num_samples',))
def furthest_point_sample(xyz, mask, num_samples: int):
    """[P,3], [P] bool → [S] int32 indices (ref mmcv furthest_point_sample).

    Starts from the first valid point; padding never gets selected while
    any valid point remains.
    """
    P = xyz.shape[0]
    big = jnp.float32(1e10)
    dist = jnp.where(mask, big, -1.0)          # invalid → negative priority
    first = jnp.argmax(mask)                    # first valid index

    def body(i, carry):
        dist, idxs = carry
        cur = idxs[i - 1]
        d = jnp.sum((xyz - xyz[cur]) ** 2, -1)
        dist = jnp.minimum(dist, jnp.where(mask, d, -1.0))
        nxt = jnp.argmax(dist)
        return dist, idxs.at[i].set(nxt.astype(jnp.int32))

    idxs0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(
        first.astype(jnp.int32))
    _, idxs = jax.lax.fori_loop(1, num_samples, body, (dist, idxs0))
    return idxs


def furthest_point_sample_fused(xyz, feats, mask, num_samples: int,
                                gamma: float = 1.0):
    """F-FPS (ref mmcv furthest_point_sample_with_dist via 3DSSD's fused
    metric): farthest sampling under d = feat_L2² + gamma·xyz_L2²."""
    P = xyz.shape[0]
    big = jnp.float32(1e10)
    dist = jnp.where(mask, big, -1.0)
    first = jnp.argmax(mask)

    def body(i, carry):
        dist, idxs = carry
        cur = idxs[i - 1]
        d = (jnp.sum((feats - feats[cur]) ** 2, -1)
             + gamma * jnp.sum((xyz - xyz[cur]) ** 2, -1))
        dist = jnp.minimum(dist, jnp.where(mask, d, -1.0))
        nxt = jnp.argmax(dist)
        return dist, idxs.at[i].set(nxt.astype(jnp.int32))

    idxs0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(
        first.astype(jnp.int32))
    _, idxs = jax.lax.fori_loop(1, num_samples, body, (dist, idxs0))
    return idxs


def gather_points(feats, idx):
    """[P, C], [S] → [S, C]."""
    return feats[idx]


@partial(jax.jit, static_argnames=('num_neighbors',))
def ball_query(centers, xyz, mask, radius, num_neighbors: int):
    """[S,3] query centers, [P,3] points → [S, K] int32 neighbor indices +
    [S, K] valid mask (ref mmcv ball_query: first K points within radius;
    here the K NEAREST within radius — a superset-quality deterministic
    choice)."""
    d2 = jnp.sum((centers[:, None] - xyz[None]) ** 2, -1)   # [S, P]
    d2 = jnp.where(mask[None], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, num_neighbors)            # [S, K]
    valid = (-neg) <= radius ** 2
    # pad invalid neighbors with the nearest valid one (ref repeats first)
    idx0 = idx[:, :1]
    idx = jnp.where(valid, idx, idx0)
    return idx.astype(jnp.int32), valid


def grouping_operation(feats, idx):
    """[P, C], [S, K] → [S, K, C]."""
    return feats[idx]


@jax.jit
def three_nn(unknown, known, known_mask):
    """[U,3], [K,3] → (dist [U,3], idx [U,3]) 3 nearest known per unknown
    (ref mmcv three_nn)."""
    d2 = jnp.sum((unknown[:, None] - known[None]) ** 2, -1)
    d2 = jnp.where(known_mask[None], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


@jax.jit
def three_interpolate(feats, idx, dist):
    """[K, C], [U, 3], [U, 3] → [U, C] inverse-distance-weighted blend
    (ref mmcv three_interpolate)."""
    w = 1.0 / jnp.maximum(dist, 1e-8) ** 2
    w = w / jnp.sum(w, -1, keepdims=True)
    return jnp.sum(feats[idx] * w[..., None], axis=1)
