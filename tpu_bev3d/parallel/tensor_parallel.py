"""Tensor (intra-layer) model parallelism for the camera branch.

Megatron-style column/row-parallel dense pairs over a named mesh axis:
the first projection is COLUMN-parallel (each device holds a slice of
the output features, no communication), the second is ROW-parallel
(each device contracts its input slice and a single `psum` over the
mesh axis restores the full activation). One all-reduce per pair, on
the ICI ring — the standard TP recipe from the public scaling
literature, applied to the Swin MLP / attention projections whose
weights dominate the camera branch's parameter memory.

The reference has no counterpart (DDP replicates every weight per GPU,
ref tools/dist_train.sh); this module is TPU-first by design:
`shard_map` over a named mesh axis with XLA inserting the collective.

Exactness: `tp_mlp` / `tp_attention` over shards == the dense
computation on one device (validated on the 8-device CPU mesh in
tests/test_engine/test_tensor_parallel.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_cols(w, mesh: Mesh, axis: str = 'data'):
    """[in, out] → out-dim sharded over `axis` (column-parallel)."""
    return jax.device_put(w, NamedSharding(mesh, P(None, axis)))


def shard_rows(w, mesh: Mesh, axis: str = 'data'):
    """[in, out] → in-dim sharded over `axis` (row-parallel)."""
    return jax.device_put(w, NamedSharding(mesh, P(axis, None)))


def tp_mlp(x, w1, b1, w2, b2, axis_name: str, act=jax.nn.gelu):
    """Column-parallel [C,H/n] → act → row-parallel [H/n,C] → psum.

    Runs inside shard_map; x is replicated, w1/b1 column-sharded,
    w2 row-sharded, b2 replicated (added once after the psum).
    """
    h = act(x @ w1 + b1)
    return jax.lax.psum(h @ w2, axis_name) + b2


def tp_attention(x, wqkv, wo, num_heads: int, axis_name: str):
    """Head-parallel multi-head self-attention.

    wqkv [C, 3*C/n] (column-sharded: each device holds its heads'
    Q/K/V projections), wo [C/n, C] (row-sharded output projection).
    x [..., T, C] replicated → full [..., T, C] after one psum.
    Local head count = num_heads / mesh size; attention is computed
    entirely locally — the only collective is the output psum.
    """
    n = jax.lax.psum(1, axis_name)
    heads_local = num_heads // n
    T, C = x.shape[-2:]
    hd = C // num_heads
    qkv = x @ wqkv                              # [..., T, 3*C/n]
    qkv = qkv.reshape(x.shape[:-1] + (3, heads_local, hd))
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    q = jnp.swapaxes(q, -3, -2)                 # [..., h, T, hd]
    k = jnp.swapaxes(k, -3, -2)
    v = jnp.swapaxes(v, -3, -2)
    a = jax.nn.softmax(q @ jnp.swapaxes(k, -1, -2) / np.sqrt(hd), -1)
    o = jnp.swapaxes(a @ v, -3, -2)             # [..., T, h, hd]
    o = o.reshape(x.shape[:-1] + (heads_local * hd,))
    return jax.lax.psum(o @ wo, axis_name)


def make_tp_mlp(mesh: Mesh, w1, b1, w2, b2, axis: str = 'data',
                act=jax.nn.gelu):
    """Build a jitted replicated-in/replicated-out TP MLP from DENSE
    weights: shards w1/b1 column-wise and w2 row-wise over `axis`,
    returns fn(x) == act(x@w1+b1)@w2+b2 computed tensor-parallel."""
    from jax.experimental.shard_map import shard_map
    w1s = shard_cols(jnp.asarray(w1), mesh, axis)
    b1s = jax.device_put(jnp.asarray(b1), NamedSharding(mesh, P(axis)))
    w2s = shard_rows(jnp.asarray(w2), mesh, axis)
    b2s = jax.device_put(jnp.asarray(b2), NamedSharding(mesh, P()))

    fn = shard_map(
        partial(tp_mlp, axis_name=axis, act=act),
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P(axis, None), P()),
        out_specs=P())
    return jax.jit(lambda x: fn(x, w1s, b1s, w2s, b2s))


def make_tp_attention(mesh: Mesh, wqkv, wo, num_heads: int,
                      axis: str = 'data'):
    """Build a jitted replicated-in/out TP attention from DENSE weights
    wqkv [C, 3C] (heads interleaved per the reshape in tp_attention) and
    wo [C, C]."""
    from jax.experimental.shard_map import shard_map
    n = mesh.devices.size
    C = wqkv.shape[0]
    hd = C // num_heads
    # regroup [C, 3C] == [C, 3, heads, hd] so each device's column slice
    # holds the full (3, heads_local, hd) block its tp_attention expects
    wq = jnp.asarray(wqkv).reshape(C, 3, num_heads, hd) \
        .transpose(0, 2, 1, 3).reshape(C, num_heads, 3 * hd)
    wq = wq.reshape(C, num_heads * 3 * hd)
    # shard over heads: [C, heads*3*hd] column-sharded = heads/n each
    wqs = jax.device_put(wq, NamedSharding(mesh, P(None, axis)))
    wos = shard_rows(jnp.asarray(wo), mesh, axis)

    def local_attn(x, wq_l, wo_l):
        heads_local = num_heads // n
        # undo the per-head regrouping locally: [C, h_l, 3, hd]
        w = wq_l.reshape(C, heads_local, 3, hd) \
            .transpose(0, 2, 1, 3).reshape(C, 3 * heads_local * hd)
        return tp_attention(x, w, wo_l, num_heads, axis)

    fn = shard_map(local_attn, mesh=mesh,
                   in_specs=(P(), P(None, axis), P(axis, None)),
                   out_specs=P())
    return jax.jit(lambda x: fn(x, wqs, wos))
