#!/usr/bin/env python
"""Minimized repro for the remote-worker deep-scan fault (VERDICT r4
weak #2 / item 5).

Known failing graphs (docs/benchmarks.md): flat-sparse encoders inside
``lax.scan`` of 30 steps; segmentor UNets inside 20-step scans. Single
calls and short scans are fine. This probe strips the failure down to
its minimal ingredients — an N-step ``lax.scan`` whose body is K flat
gather-GEMM sparse convs (the random-row-gather pattern) — and walks N
upward until the worker faults, printing the largest N that survives.

Usage (REAL TPU; each probe is a fresh jitted graph):
    python tools/probe_scan_fault.py [--rows 20000] [--channels 64]
        [--convs 8] [--steps 5 10 20 30 50]

Findings land in docs/benchmarks.md ("Remote scan-fault class").
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=20000)
    ap.add_argument('--channels', type=int, default=64)
    ap.add_argument('--convs', type=int, default=8,
                    help='gather-GEMM pairs per scan step')
    ap.add_argument('--steps', type=int, nargs='+',
                    default=[5, 10, 20, 30, 50])
    ap.add_argument('--plain', action='store_true',
                    help='control arm: same FLOPs/steps but NO gathers '
                         '(pure GEMM body) — isolates the gather as the '
                         'trigger')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    if os.environ.get('TPU_BEV3D_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['TPU_BEV3D_PLATFORM'])

    N, C, K = args.rows, args.channels, args.convs
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, (27, N)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((27, C, C)).astype(np.float32)
                    * 0.05)

    def body_conv(x):
        # one flat submanifold gather-GEMM: 27 random-row gathers + GEMM
        g = jnp.take(x, idx.reshape(-1), axis=0).reshape(27, N, C)
        return jnp.einsum('knc,kcd->nd', g, w)

    def body_plain(x):
        return jnp.einsum('nc,kcd->nd', x, w) / 27.0

    step_fn = body_plain if args.plain else body_conv

    for S in args.steps:
        xs = jnp.asarray(rng.standard_normal((S, N, C)).astype(np.float32))

        @jax.jit
        def run(xs):
            def body(carry, x):
                y = carry + x
                for _ in range(K):
                    y = step_fn(y) * 0.1 + y
                return y, jnp.sum(jnp.abs(y))
            _, accs = jax.lax.scan(body,
                                   jnp.zeros((N, C), jnp.float32), xs)
            return jnp.sum(accs)

        t0 = time.perf_counter()
        try:
            v = float(run(xs))
            print(f'steps={S:3d}: OK ({time.perf_counter() - t0:.1f}s, '
                  f'acc={v:.3e})', flush=True)
        except Exception as e:  # noqa: BLE001 — record the worker fault
            print(f'steps={S:3d}: FAULT after '
                  f'{time.perf_counter() - t0:.1f}s — '
                  f'{type(e).__name__}: {str(e)[:300]}', flush=True)
            break


if __name__ == '__main__':
    main()
