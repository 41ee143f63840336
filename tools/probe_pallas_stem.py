#!/usr/bin/env python
"""A/B the Pallas fused stem kernel vs the XLA scatter path (VERDICT r4
item 9) at flagship geometry — scan-chained op-level protocol (the only
trustworthy instrument on the tunnel; see tools/probe_lidar_path.py).

Run on the real TPU:  python tools/probe_pallas_stem.py [--reps 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=30)
    ap.add_argument('--voxels', type=int, default=36000)
    ap.add_argument('--max-rows', type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    if os.environ.get('TPU_BEV3D_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['TPU_BEV3D_PLATFORM'])
    from tpu_bev3d.models.middle_encoders.bev_column_encoder import \
        fused_stem_scatter
    from tpu_bev3d.ops.pallas_stem import pallas_stem_scatter

    # flagship geometry (bevfusion_lidar_cam_tpu_fast_nus.py)
    nz, ny, nx, p, C, ch0 = 41, 1440, 1440, 4, 5, 128
    V = args.voxels
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((V, C)).astype(np.float32))
    z = rng.integers(0, nz, V)
    yx = rng.normal(720, 260, (2, V)).clip(0, 1439).astype(np.int64)
    coords = np.stack([np.zeros(V, np.int64), z, yx[0], yx[1]], -1)
    coords = jnp.asarray(coords.astype(np.int32))
    w = jnp.asarray(rng.standard_normal(
        (nz * p * p, C, ch0)).astype(np.float32) * 0.05)

    def bench(fn, tag):
        @jax.jit
        def run(f0):
            def body(carry, _):
                f = carry
                out = fn(f)
                s = jnp.sum(jnp.abs(out).astype(jnp.float32))
                return f + 1e-6 * s, 0
            c, _ = jax.lax.scan(body, f0, None, length=args.reps)
            return jnp.sum(c)
        jax.block_until_ready(run(feats))          # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(feats))
            best = min(best, time.perf_counter() - t0)
        print(f'{tag:14s} {(best * 1000 - 23) / args.reps:7.2f} ms/op '
              f'(total {best * 1000:.0f} ms, {args.reps} reps)',
              flush=True)

    bench(lambda f: fused_stem_scatter(
        f, coords, w, batch_size=1, nz=nz, ny=ny, nx=nx, pack_xy=p),
        'xla scatter')
    bench(lambda f: pallas_stem_scatter(
        f, coords, w, batch_size=1, nz=nz, ny=ny, nx=nx, pack_xy=p,
        max_rows=args.max_rows),
        'pallas kernel')


if __name__ == '__main__':
    main()
