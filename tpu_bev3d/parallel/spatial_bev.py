"""Spatial (BEV-grid) model parallelism with halo exchange.

The perception-stack analogue of LLM context parallelism (SURVEY §5):
when the BEV canvas outgrows one chip's HBM (e.g. finer voxel grids or
longer detection ranges than the flagship's 1440×1440), shard the BEV
X axis over the mesh and keep convolutions exact by exchanging 1-ring
halos between neighbouring shards with `lax.ppermute` — collectives ride
the ICI ring; no host involvement.

The reference has no counterpart (its DDP replicates the full canvas per
GPU, ref tools/dist_train.sh); this module is TPU-first by design:
`shard_map` over a named mesh axis, XLA inserting the neighbour
exchanges into the fused program.

Exactness: `halo_conv2d` over shards == dense `lax.conv` over the full
canvas (validated on the 8-device CPU mesh in
tests/test_engine/test_spatial_bev.py).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_bev(x, mesh: Mesh, axis: str = 'data'):
    """[B, X, Y, C] → sharded along X over `axis` (X must divide)."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis)))


def unshard_bev(x):
    return jax.device_get(x)


def halo_exchange(x, axis_name: str, halo: int = 1):
    """Append the right-neighbour's first `halo` rows and prepend the
    left-neighbour's last `halo` rows (zeros at mesh boundary).

    x [B, Xs, Y, C] per-shard → [B, Xs + 2*halo, Y, C].
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send my top `halo` rows to the LEFT neighbour (they become its
    # bottom halo) and my bottom rows to the RIGHT neighbour
    top = x[:, :halo]
    bot = x[:, -halo:]
    right_halo = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % n) for i in range(n)])
    left_halo = jax.lax.ppermute(
        bot, axis_name, [(i, (i + 1) % n) for i in range(n)])
    # zero the wrap-around at the global boundary
    left_halo = jnp.where(idx == 0, 0.0, left_halo)
    right_halo = jnp.where(idx == n - 1, 0.0, right_halo)
    return jnp.concatenate([left_halo, x, right_halo], axis=1)


def halo_conv2d(x, w, axis_name: str, stride: int = 1):
    """3×3 'SAME' conv on an X-sharded BEV canvas, exact via halo
    exchange. x [B, Xs, Y, C]; w [3, 3, C, C'] (HWIO). stride must
    divide the shard size."""
    kh = w.shape[0]
    halo = kh // 2
    xh = halo_exchange(x, axis_name, halo)
    # X direction: halos supply the 'SAME' context → VALID; Y: pad SAME
    return jax.lax.conv_general_dilated(
        xh, w, window_strides=(stride, stride),
        padding=((0, 0), (halo, halo)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def spatial_conv_trunk(x, weights: Sequence[jnp.ndarray], axis_name: str):
    """A stack of 3×3 stride-1 conv+relu layers over the sharded canvas —
    the BEVColumnEncoder-trunk shape, each layer exchanging halos."""
    for w in weights:
        x = jax.nn.relu(halo_conv2d(x, w, axis_name))
    return x


def make_sharded_trunk(mesh: Mesh, weights, axis: str = 'data'):
    """jit-compiled shard_map trunk: [B, X, Y, C] sharded along X."""
    try:
        from jax import shard_map
    except ImportError:                       # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        partial(spatial_conv_trunk, weights=tuple(weights),
                axis_name=axis),
        mesh=mesh, in_specs=P(None, axis), out_specs=P(None, axis))
    return jax.jit(fn)
