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


@partial(jax.jit, static_argnames=('num_samples', 'num_chunks'))
def furthest_point_sample_bucketed(xyz, mask, num_samples: int,
                                   num_chunks: int = 8):
    """Latency-parallel FPS: interleaved subsample-union decomposition.

    Exact FPS (above) is a ``num_samples``-step sequential dependency
    chain — the bound on VoteNet/PointNet++ TPU latency (the reference's
    CUDA ``furthest_point_sample`` has the same chain but ~100 ns steps).
    TPU redesign: split the cloud into ``num_chunks`` strided subsamples
    (point i → chunk i % G), run EXACT FPS inside each chunk in parallel
    (vmap), and take the union.  Each chunk is a uniform 1/G subsample of
    the full cloud, so per-chunk FPS spreads its quota over the full
    scene extent — the union approximates the global FPS set (the same
    subsample-union construction as parallel-FPS literature), while the
    sequential chain shrinks G-fold to ``num_samples / G`` steps.

    Quality is A/B-tested in tests/test_ops/test_pointnet_ops.py: the
    FPS objective (max-min coverage radius) of the union stays within a
    small factor of exact FPS.

    Ref being replaced: mmdet3d/models/layers/pointnet_modules/
    point_sa_module.py (mmcv furthest_point_sample).
    """
    P = xyz.shape[0]
    G = num_chunks
    if G <= 1:
        return furthest_point_sample(xyz, mask, num_samples)
    if num_samples % G or num_samples < G:
        raise ValueError(
            f'num_samples={num_samples} not divisible by fps chunks {G}')
    pad = (-P) % G
    if pad:
        xyz = jnp.concatenate([xyz, jnp.zeros((pad, 3), xyz.dtype)], 0)
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)], 0)
        P = P + pad
    # chunk g holds points [g, g+G, g+2G, ...] — column g of the reshape
    cx = xyz.reshape(P // G, G, 3).transpose(1, 0, 2)     # [G, P/G, 3]
    cm = mask.reshape(P // G, G).T                        # [G, P/G]
    sub = jax.vmap(
        lambda x, m: furthest_point_sample(x, m, num_samples // G))(cx, cm)
    glob = sub * G + jnp.arange(G, dtype=jnp.int32)[:, None]  # local→global
    out = glob.reshape(-1)
    if pad:
        out = jnp.minimum(out, xyz.shape[0] - 1 - pad)
    return out.astype(jnp.int32)


def fps(xyz, mask, num_samples: int, num_chunks: int = 1):
    """Dispatch exact vs bucketed FPS on the ``num_chunks`` knob."""
    if num_chunks and num_chunks > 1:
        return furthest_point_sample_bucketed(xyz, mask, num_samples,
                                              num_chunks)
    return furthest_point_sample(xyz, mask, num_samples)


@partial(jax.jit, static_argnames=('num_samples', 'num_chunks'))
def furthest_point_sample_fused_bucketed(xyz, feats, mask,
                                         num_samples: int,
                                         num_chunks: int = 8,
                                         gamma: float = 1.0):
    """Bucketed F-FPS (same subsample-union construction as
    furthest_point_sample_bucketed, fused feature+xyz metric)."""
    P = xyz.shape[0]
    G = num_chunks
    if G <= 1:
        return furthest_point_sample_fused(xyz, feats, mask, num_samples,
                                           gamma)
    if num_samples % G or num_samples < G or P % G:
        raise ValueError(
            f'P={P}/num_samples={num_samples} not divisible by {G}')
    cx = xyz.reshape(P // G, G, 3).transpose(1, 0, 2)
    cf = feats.reshape(P // G, G, feats.shape[-1]).transpose(1, 0, 2)
    cm = mask.reshape(P // G, G).T
    sub = jax.vmap(
        lambda x, f, m: furthest_point_sample_fused(
            x, f, m, num_samples // G, gamma))(cx, cf, cm)
    glob = sub * G + jnp.arange(G, dtype=jnp.int32)[:, None]
    return glob.reshape(-1).astype(jnp.int32)


def gather_points(feats, idx):
    """[P, C], [S] → [S, C]."""
    return feats[idx]


def _pairwise_d2(a, b):
    """[S,3] × [P,3] → [S,P] squared distances in MXU GEMM form
    (‖a‖² + ‖b‖² − 2·a@bᵀ). The naive broadcast-subtract form
    materializes an [S,P,3] intermediate — ~1 GB of HBM traffic at
    VoteNet SA1 geometry (2048×40000) — where the GEMM form streams one
    [S,P] matrix off the MXU. Cancellation error near d≈0 is ≪ any
    radius² threshold used by the callers."""
    a2 = jnp.sum(a * a, -1, keepdims=True)                  # [S, 1]
    b2 = jnp.sum(b * b, -1)[None]                           # [1, P]
    return jnp.maximum(a2 + b2 - 2.0 * (a @ b.T), 0.0)


@partial(jax.jit, static_argnames=('num_neighbors', 'method'))
def ball_query(centers, xyz, mask, radius, num_neighbors: int,
               method: str = ''):
    """[S,3] query centers, [P,3] points → [S, K] int32 neighbor indices +
    [S, K] valid mask (ref mmcv ball_query: first K points within radius;
    here K NEAR points within radius — a superset-quality deterministic
    choice).

    Selection backend (``method`` arg, or TPU_BEV3D_BALLQ when empty):
    - 'exact' (default): ``lax.top_k`` — a full per-row sort. On TPU
      this sort IS the VoteNet latency budget (measured: the whole
      model is 119 ms with it, 7.5 ms without — the [2048, 40000] SA1
      selection dwarfs every conv).
    - 'approx': ``lax.approx_max_k`` — the TPU-native partial-reduction
      top-k (no row sort, ~0.95 recall of the true K nearest). Both
      backends satisfy the reference contract, which takes an ARBITRARY
      K points within the radius (mmcv ball_query.cu fills in scan
      order) — a 0.95-recall near-neighbor set is strictly closer than
      the reference's first-K-encountered set.
    """
    import os
    d2 = _pairwise_d2(centers, xyz)                         # [S, P]
    d2 = jnp.where(mask[None], d2, jnp.inf)
    m = method or os.environ.get('TPU_BEV3D_BALLQ', 'exact')
    if m == 'approx':
        neg, idx = jax.lax.approx_max_k(-d2, num_neighbors)
    else:
        neg, idx = jax.lax.top_k(-d2, num_neighbors)        # [S, K]
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
    d2 = _pairwise_d2(unknown, known)
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
