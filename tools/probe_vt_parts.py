#!/usr/bin/env python
"""Bisect the DepthLSS lift_and_pool (vt_pool, ~12 ms — the flagship's
largest single block per tools/probe_lidar_path.py) into sub-ops at
flagship scale: B=1, N=6, fH/fW=32/88, D=118, k=24, C=80, BEV 360x360.

Scan-chained protocol (see probe_lidar_path.py)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=16)
    ap.add_argument('--topk', type=int, default=24)
    args = ap.parse_args()
    REPS = args.reps

    import jax
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(root, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    if os.environ.get('TPU_BEV3D_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['TPU_BEV3D_PLATFORM'])
    import jax.numpy as jnp
    import numpy as np

    B, N, fH, fW, D, C = 1, 6, 32, 88, 118, 80
    k = args.topk
    NX = NY = 360
    rng = np.random.default_rng(0)

    def timed(name, fn, x0):
        def run(x0):
            def body(c, _):
                x, s = c
                xp = jax.tree_util.tree_map(
                    lambda a: a + s.astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, x)
                y = fn(xp)
                acc = sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) * 1e-20
                          for l in jax.tree_util.tree_leaves(y)
                          if jnp.issubdtype(l.dtype, jnp.floating))
                return (x, s + 1e-6 + acc), 0
            (_, s), _ = jax.lax.scan(body, (x0, jnp.float32(0)), None,
                                     length=REPS)
            return s
        jf = jax.jit(run)
        jax.block_until_ready(jf(x0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jf(x0))
            best = min(best, (time.perf_counter() - t0) * 1000)
        print(f'{name:24s} {(best - 23) / REPS:8.2f} ms/op   '
              f'(total {best:.0f} ms, {REPS} reps)', flush=True)

    dl = jnp.asarray(rng.standard_normal((B, N, fH, fW, D))
                     .astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, fH, fW, C))
                        .astype(np.float32), jnp.bfloat16)
    geom = jnp.asarray((rng.standard_normal((B, N, D, fH, fW, 3)) * 30)
                       .astype(np.float32))
    topi0 = jnp.asarray(rng.integers(0, D, (B, N, fH, fW, k)), jnp.int32)
    # plausible rank distribution: clustered cells
    ranks0 = jnp.asarray(
        np.clip((rng.standard_normal((B, N * fH * fW * k)) * 20000
                 + 64800), 0, NX * NY - 1).astype(np.int32))
    up0 = jnp.asarray(rng.standard_normal((B, N * fH * fW * k, C))
                      .astype(np.float32))

    timed('softmax_topk', lambda x: jax.lax.top_k(
        jax.nn.softmax(x, -1), k), dl)

    timed('outer_bf16', lambda tv: tv[..., None].astype(feats.dtype)
          * feats[..., None, :],
          jnp.asarray(rng.standard_normal((B, N, fH, fW, k))
                      .astype(np.float32)))

    def geom_gather(g):
        gt = jnp.transpose(g, (0, 1, 3, 4, 2, 5))
        return jnp.take_along_axis(gt, topi0[..., None], axis=4)
    timed('geom_transpose_gather', geom_gather, geom)

    def geom_direct(g):
        # compute geometry only at top-k bins: frustum xs/ys fixed,
        # depth from bin index — same einsum chain, k instead of D rows
        ds = 1.0 + topi0.astype(jnp.float32) * 0.5        # [B,N,fH,fW,k]
        xs = jnp.linspace(0, 703, fW)[None, None, None, :, None]
        ys = jnp.linspace(0, 255, fH)[None, None, :, None, None]
        pts = jnp.stack([jnp.broadcast_to(xs * ds / jnp.maximum(ds, 1), ds.shape) * ds,
                         jnp.broadcast_to(ys, ds.shape) * ds, ds], -1)
        rot = g[:, :, 0, 0, 0, :][:, :, None, None, None, :]  # data dep
        return pts + rot
    timed('geom_direct_topk', geom_direct, geom)

    def scatter_add(up):
        out = jnp.zeros((NX * NY, C), jnp.float32)
        return out.at[ranks0[0]].add(up[0], mode='drop')
    timed(f'scatter_{N*fH*fW*k//1000}k_rows', scatter_add, up0)

    half = N * fH * fW * k // 2
    def scatter_half(up):
        out = jnp.zeros((NX * NY, C), jnp.float32)
        return out.at[ranks0[0, :half]].add(up[0, :half], mode='drop')
    timed(f'scatter_{half//1000}k_rows', scatter_half, up0)

    def scatter_sorted(up):
        r = jnp.sort(ranks0[0])
        out = jnp.zeros((NX * NY, C), jnp.float32)
        return out.at[r].add(up[0], mode='drop', indices_are_sorted=True)
    timed('scatter_sorted_flag', scatter_sorted, up0)

    def sort_segsum(up):
        order = jnp.argsort(ranks0[0])
        r = ranks0[0][order]
        u = up[0][order]
        return jax.ops.segment_sum(u, r, num_segments=NX * NY,
                                   indices_are_sorted=True)
    timed('argsort_segment_sum', sort_segsum, up0)

    def scatter_bf16(up):
        out = jnp.zeros((NX * NY, C), jnp.bfloat16)
        return out.at[ranks0[0]].add(up[0].astype(jnp.bfloat16),
                                     mode='drop')
    timed('scatter_bf16_accum', scatter_bf16, up0)

    def out_transpose(x):
        y = jnp.transpose(x.reshape(B, 1, NX, NY, C), (0, 1, 4, 2, 3))
        return jnp.transpose(y.reshape(B, C, NX, NY), (0, 2, 3, 1))
    timed('canvas_transposes', out_transpose,
          jnp.asarray(rng.standard_normal((B, NX * NY, C))
                      .astype(np.float32)))


if __name__ == '__main__':
    main()
