#!/usr/bin/env python
"""Tile-shape sweep for the MinkUNet stem regime (VERDICT r4 item 4:
2.4 rows/tile at (2,4,4) = 13× cell overcompute). Times subm_conv3d_tile
and the k2-s2 down conv at SemanticKITTI full-res sizing across candidate
tile shapes on a REALISTIC surface-clustered cloud, reporting fill rate
and ms — the measured winner drives per-stage tile shapes.

Run on the real TPU:  python tools/probe_minkunet_tiles.py
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=10)
    ap.add_argument('--num-points', type=int, default=120000)
    ap.add_argument('--channels', type=int, default=32)
    # model-usable stem shapes must be stride-divisible (the s=2 inverse
    # conv targets the stem table); 1x4x4 kept as an informational arm
    ap.add_argument('--shapes',
                    default='2x4x4,2x2x4,2x2x2,4x4x4,1x4x4')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    if os.environ.get('TPU_BEV3D_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['TPU_BEV3D_PLATFORM'])
    from tpu_bev3d.ops.sparse_conv import SparseTensor
    from tpu_bev3d.ops.tile_sparse import (tiles_from_sparse,
                                           subm_conv3d_tile,
                                           sparse_conv3d_tile)
    from tpu_bev3d.testing.model_utils import lidar_scan_points

    rng = np.random.default_rng(0)
    pcr = (-50, -50, -4, 50, 50, 2)
    pts = lidar_scan_points(rng, args.num_points, pcr)
    vs = 0.05
    ijk = np.floor((pts - np.asarray(pcr[:3])) / vs).astype(np.int64)
    shape = tuple(int(np.ceil((pcr[i + 3] - pcr[i]) / vs))
                  for i in range(3))
    # zyx coords, dedup
    key = (ijk[:, 2] * shape[1] + ijk[:, 1]) * shape[0] + ijk[:, 0]
    _, idx = np.unique(key, return_index=True)
    ijk = ijk[idx]
    V = len(ijk)
    C = args.channels
    shape_zyx = (shape[2], shape[1], shape[0])
    coords = np.concatenate(
        [np.zeros((V, 1), np.int64), ijk[:, 2:3], ijk[:, 1:2],
         ijk[:, 0:1]], -1).astype(np.int32)
    capV = args.num_points
    cp = np.full((capV, 4), -1, np.int32)
    cp[:V] = coords
    fp = np.zeros((capV, C), np.float32)
    fp[:V] = rng.standard_normal((V, C)).astype(np.float32) * 0.1
    st = SparseTensor(jnp.asarray(fp), jnp.asarray(cp), shape_zyx, 1)
    print(f'grid={shape_zyx} V={V}', flush=True)

    def bench(tag, fn, tt):
        @jax.jit
        def run(c):
            def body(carry, _):
                out = fn(tt.replace_features(tt.features * carry))
                s = jnp.sum(jnp.abs(out.features).astype(jnp.float32))
                return carry + 1e-9 * s, 0
            c2, _ = lax.scan(body, c, None, length=args.reps)
            return c2
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.float32(1.0)))
        ct = time.perf_counter() - t0
        best = 1e9
        for r in range(3):
            t0 = time.perf_counter()
            float(run(jnp.float32(1.0 + 0.1 * r)))
            best = min(best, (time.perf_counter() - t0) / args.reps)
        print(f'  [{tag}] {best*1000:.2f} ms/iter (compile {ct:.0f}s)',
              flush=True)

    for s in args.shapes.split(','):
        tile = tuple(int(v) for v in s.split('x'))
        S = int(np.prod(tile))
        # generous capacity: V / (expected fill ~1.2) rounded up
        cap = int(V * 1.6 / max(S // 16, 1)) if S > 8 else int(V * 1.2)
        cap = min(cap, 120000)
        tt = tiles_from_sparse(st, tile, cap, index_mode='sorted')
        nact = int(jnp.sum(tt.valid))
        fill = V / max(nact, 1)
        print(f'== tile {tile} S={S}: {nact} tiles (cap {cap}), fill '
              f'{fill:.2f} rows/tile, overcompute {S / fill:.1f}x ==',
              flush=True)
        if nact >= cap:
            print('   CAP OVERFLOW — skip timing', flush=True)
            continue
        w = jnp.asarray(rng.standard_normal((27, C, C)).astype(
            np.float32) * 0.05)
        bench(f'subm_{s}', lambda t, w=w: subm_conv3d_tile(t, w), tt)
        w2 = jnp.asarray(rng.standard_normal((8, C, 2 * C)).astype(
            np.float32) * 0.05)
        bench(f'down_{s}',
              lambda t, w2=w2, cap=cap: sparse_conv3d_tile(
                  t, w2, kernel_size=2, stride=2, padding=0,
                  out_capacity=max(cap * 2 // 3, 1024), rule='spconv'),
              tt)


if __name__ == '__main__':
    main()
