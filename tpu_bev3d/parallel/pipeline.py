"""Pipeline (inter-layer) model parallelism over a named mesh axis.

GPipe-style microbatch pipelining, TPU-first: every device holds ONE
stage's weights (stage-sharded along the leading axis), activations flow
stage→stage with a single `lax.ppermute` ring shift per tick, and the
whole schedule is one `lax.fori_loop` inside `shard_map` — a fixed
(M + n − 1)-tick wavefront for M microbatches over n stages, no
data-dependent control flow, everything static-shaped. One final `psum`
replicates the last stage's output buffer (every other stage's buffer
is zeros, so the sum IS the result).

The reference has no counterpart (its parallelism surface is DDP only,
ref tools/dist_train.sh:10-19, SURVEY §2.5); this is the standard
pipeline recipe from the public scaling literature expressed with XLA
collectives, provided for models whose stage weights outgrow one chip
(e.g. chained BEV trunks / transformer decoders at serving depth).

Exactness: `make_pipeline(...)(x)` == applying the n stage functions
sequentially on one device (validated on the 8-device CPU mesh in
tests/test_engine/test_pipeline_parallel.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 promoted shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _pipeline_local(params_l, x_mb, stage_fn, axis_name: str,
                    n_stages: int):
    """Runs on ONE device inside shard_map.

    params_l: this device's stage weights (leading stage axis of size 1
    from the in_spec, squeezed here). x_mb: the full [M, ...] microbatch
    stack (replicated; only stage 0 reads it). Returns the replicated
    [M, ...] output stack.
    """
    idx = lax.axis_index(axis_name)
    params_l = jax.tree.map(lambda p: p[0], params_l)
    M = x_mb.shape[0]
    ticks = M + n_stages - 1
    # ring: stage i sends to stage i+1 (the wrap edge carries values
    # stage 0 immediately overwrites with fresh microbatches)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(t, carry):
        state, out = carry
        # stage 0 injects microbatch t (last one re-read harmlessly
        # during drain ticks); other stages consume the ring shift
        fresh = lax.dynamic_index_in_dim(x_mb, jnp.minimum(t, M - 1), 0,
                                         keepdims=False)
        inp = jnp.where(idx == 0, fresh, state)
        y = stage_fn(params_l, inp)
        # stage n−1 emits microbatch j = t−(n−1) once the wave arrives
        j = t - (n_stages - 1)
        jc = jnp.clip(j, 0, M - 1)
        emit = (idx == n_stages - 1) & (j >= 0)
        old = lax.dynamic_index_in_dim(out, jc, 0, keepdims=False)
        out = lax.dynamic_update_index_in_dim(
            out, jnp.where(emit, y, old), jc, 0)
        state = lax.ppermute(y, axis_name, perm)
        return state, out

    # the carry becomes device-varying inside the loop (idx-dependent
    # writes); mark the zero inits varying so the carry types match
    state0 = lax.pcast(jnp.zeros_like(x_mb[0]), (axis_name,),
                       to='varying')
    out0 = lax.pcast(jnp.zeros_like(x_mb), (axis_name,), to='varying')
    _, out = lax.fori_loop(0, ticks, tick, (state0, out0))
    # every stage but n−1 held zeros → the psum replicates the result
    return lax.psum(out, axis_name)


def make_pipeline(mesh: Mesh, stage_fn, stage_params, axis: str = 'data'):
    """Build a jitted pipelined apply from per-stage weights.

    ``stage_fn(params_i, x) -> y`` must be shape-preserving (same
    activation shape at every stage boundary — project at the boundaries
    otherwise). ``stage_params`` is a pytree whose leaves carry a leading
    stage axis of size ``n = mesh size``; slice i holds stage i's
    weights. Returns ``fn(x_mb)`` mapping [M, ...] microbatches to the
    [M, ...] outputs ``stage_{n−1}(…stage_0(x_mb[j])…)``.
    """
    n = int(mesh.devices.size)
    params_sh = jax.tree.map(
        lambda p: jax.device_put(jnp.asarray(p),
                                 NamedSharding(mesh, P(axis))),
        stage_params)
    in_specs = (jax.tree.map(lambda _: P(axis), stage_params), P())
    fn = shard_map(
        partial(_pipeline_local, stage_fn=stage_fn, axis_name=axis,
                n_stages=n),
        mesh=mesh, in_specs=in_specs, out_specs=P())
    return jax.jit(lambda x_mb: fn(params_sh, x_mb))
