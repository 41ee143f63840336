#!/usr/bin/env python
"""Micro-probe: TPU gather/scatter cost vs payload-row shape.

Hypothesis: each gathered row pays tile-padded traffic (minor dim →128
lanes, next →8 sublanes), so [N, 4, 16] rows cost ~16x their bytes while
[N, 512] rows are near-roofline. Scalar gathers pay a full tile each.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
REPS = 24


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    if os.environ.get('TPU_BEV3D_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['TPU_BEV3D_PLATFORM'])
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)

    def timed(name, fn, x0, nbytes):
        def run(x0):
            def body(x, _):
                return fn(x), 0
            y, _ = jax.lax.scan(body, x0, None, length=REPS)
            return jnp.sum(jnp.abs(y).astype(jnp.float32))
        jf = jax.jit(run)
        jax.block_until_ready(jf(x0))
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x0))
        dt = (time.perf_counter() - t0) * 1000
        ms = (dt - 23) / REPS
        print(f'{name:44s} {ms:8.3f} ms/op  '
              f'{nbytes / max(ms, 1e-9) / 1e6:8.1f} GB/s')
        sys.stdout.flush()

    T = 8192
    D = 26
    idx = jnp.asarray(rng.integers(0, T, D * T).astype(np.int32))

    # bf16 tile payload, vol*C = 512
    src = jnp.asarray(rng.standard_normal((T, 2, 4, 4, 16))
                      .astype(np.float32)).astype(jnp.bfloat16)
    nb = D * T * 512 * 2

    def g_shaped(x):
        return (jnp.take(x, idx, axis=0).reshape(D * T, -1)[:T].reshape(
            x.shape[1:])[None] * 1e-3 + x) if False else (
            x + 1e-3 * jnp.take(x, idx, axis=0).reshape(
                D, T, *x.shape[1:]).sum(0))
    timed('gather 213k rows [2,4,4,16] bf16', g_shaped, src, nb)

    src2 = src.reshape(T, 512)

    def g_flat(x):
        return x + 1e-3 * jnp.take(x, idx, axis=0).reshape(D, T, -1).sum(0)
    timed('gather 213k rows [512] bf16', g_flat, src2, nb)

    src3 = src.reshape(T, 4, 128)

    def g_128(x):
        return x + 1e-3 * jnp.take(x, idx, axis=0).reshape(
            D, T, 4, 128).sum(0)
    timed('gather 213k rows [4,128] bf16', g_128, src3, nb)

    # scalar gather: 221k from 3M i32
    big = jnp.asarray(rng.integers(0, 100, 3_000_000).astype(np.int32))
    qi = jnp.asarray(rng.integers(0, 3_000_000, 27 * T).astype(np.int32))

    def g_scalar(x):
        return x.at[:T].add(x[qi].reshape(27, T).sum(0) % 3)
    timed('scalar gather 221k from 3M i32', g_scalar, big, 27 * T * 4)

    # scalar gather smaller: 65k from 3M
    qi2 = qi[:65536]

    def g_scalar2(x):
        return x.at[:65536].add(x[qi2] % 3)
    timed('scalar gather 65k from 3M i32', g_scalar2, big, 65536 * 4)

    # scatter 16k rows of [16] f32 into 262k (tiles_from_sparse shape)
    val16 = jnp.asarray(rng.standard_normal((16000, 16)).astype(np.float32))
    di = jnp.asarray(rng.integers(0, 262144, 16000).astype(np.int32))

    def s_16(v):
        out = jnp.zeros((262145, 16), v.dtype).at[di].set(v, mode='drop')
        return v + 1e-6 * out[:16000]
    timed('scatter 16k rows [16] f32', s_16, val16, 16000 * 64)

    val128 = jnp.asarray(
        rng.standard_normal((16000, 128)).astype(np.float32))

    def s_128(v):
        out = jnp.zeros((262145, 128), v.dtype).at[di].set(v, mode='drop')
        return v + 1e-6 * out[:16000]
    timed('scatter 16k rows [128] f32', s_128, val128, 16000 * 512)

    # cumsum comparison
    occ = jnp.asarray(rng.integers(0, 2, 3_000_000).astype(np.int32))

    def c_flat(x):
        return x.at[:8].add(jnp.cumsum(x)[-8:] % 3)
    timed('cumsum 3M i32 flat', c_flat, occ, 3_000_000 * 8)

    occ2 = occ[:2999296].reshape(-1, 1024)

    def c_blk(x):
        w = jnp.cumsum(x, -1)
        b = jnp.cumsum(w[:, -1])
        return x.at[0, :8].add(b[-8:] % 3)
    timed('cumsum 3M i32 blocked(1024)', c_blk, occ2, 3_000_000 * 8)


if __name__ == '__main__':
    main()
