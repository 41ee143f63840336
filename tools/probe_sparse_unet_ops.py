#!/usr/bin/env python
"""Op-level bisection of the Part-A2 tile SparseUNet forward (5.9 s/iter
at KITTI sizing — probe_parta2_parts.py). Times each tile op at each
stage's realistic size, scan-chained.

Run on the real TPU:  python tools/probe_sparse_unet_ops.py
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
    ap.add_argument('--only', default=None)
    args = ap.parse_args()
    only = set(args.only.split(',')) if args.only else None

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
    from tpu_bev3d.ops.tile_sparse import (
        tiles_from_sparse, subm_conv3d_tile, sparse_conv3d_tile,
        tile_inverse_conv3d_general)

    rng = np.random.default_rng(0)
    B = 2

    def mk_tiles(shape, n_vox, cap, C, tile=(2, 4, 4)):
        """Surface-clustered-ish coords: sample cluster centers, scatter
        points around them (mimics lidar tile locality)."""
        ncl = max(n_vox // 24, 1)
        centers = np.stack([rng.integers(0, s, ncl) for s in shape], -1)
        pts = centers[rng.integers(0, ncl, n_vox)] + rng.integers(
            -3, 4, (n_vox, 3))
        pts = np.clip(pts, 0, np.asarray(shape) - 1)
        b = rng.integers(0, B, n_vox)
        key = ((b * shape[0] + pts[:, 0]) * shape[1] + pts[:, 1]) \
            * shape[2] + pts[:, 2]
        _, idx = np.unique(key, return_index=True)
        pts, b = pts[idx], b[idx]
        V = len(pts)
        coords = np.concatenate([b[:, None], pts], -1).astype(np.int32)
        capV = n_vox
        cp = np.full((capV, 4), -1, np.int32)
        cp[:V] = coords
        fp = np.zeros((capV, C), np.float32)
        fp[:V] = rng.standard_normal((V, C)).astype(np.float32) * 0.1
        st = SparseTensor(jnp.asarray(fp), jnp.asarray(cp), shape, B)
        tt = tiles_from_sparse(st, tile, cap * B)
        print(f'  shape={shape} V={V} tiles='
              f'{int(jnp.sum(tt.valid))}/{cap * B}', flush=True)
        return tt

    def bench(tag, fn, tt):
        if only and tag not in only:
            return
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
        print(f'  [{tag}] {best*1000:.1f} ms/iter (compile {ct:.0f}s)',
              flush=True)

    # Part-A2 KITTI stage geometry (sparse_shape [41,1600,1408], ~16k vox)
    shp = [(41, 1600, 1408), (21, 800, 704), (11, 400, 352),
           (6, 200, 176)]
    nvox = [16000, 13000, 9000, 5000]
    caps = [8192, 4096, 2048, 1024]
    chs = [16, 32, 64, 64]
    tts = {}
    for s_i in range(4):
        print(f'== stage {s_i} ==', flush=True)
        tt = mk_tiles(shp[s_i], nvox[s_i], caps[s_i], chs[s_i])
        tts[s_i] = tt
        C = chs[s_i]
        w = jnp.asarray(rng.standard_normal((27, C, C)).astype(
            np.float32) * 0.05)
        bench(f's{s_i}_subm_C{C}', lambda t, w=w: subm_conv3d_tile(t, w),
              tt)
        if s_i < 3:
            Cn = chs[s_i + 1]
            ws = jnp.asarray(rng.standard_normal((27, C, Cn)).astype(
                np.float32) * 0.05)
            bench(f's{s_i}_down_C{C}->C{Cn}',
                  lambda t, ws=ws, cap=caps[s_i + 1]: sparse_conv3d_tile(
                      t, ws, stride=2, out_capacity=cap * B,
                      rule='spconv'), tt)
    # inverse convs: stage s+1 -> s (k3 s2), channels per decoder spec
    inv_ch = {3: (64, 64), 2: (64, 32), 1: (32, 16)}
    for s_i in (3, 2, 1):
        Ci, Co = inv_ch[s_i]
        src = tts[s_i]
        if src.channels != Ci:
            f = src.features.reshape(src.features.shape[0], src.S, -1)
            reps = Ci // src.channels
            f = jnp.tile(f, (1, 1, reps)).reshape(
                src.features.shape[0], -1)
            import dataclasses
            src = dataclasses.replace(src, features=f, channels=Ci)
        wi = jnp.asarray(rng.standard_normal((27, Ci, Co)).astype(
            np.float32) * 0.05)
        tgt = tts[s_i - 1]
        print(f'== inverse s{s_i}->s{s_i-1} C{Ci}->C{Co} ==', flush=True)
        bench(f'inv_s{s_i}', lambda t, wi=wi, tgt=tgt:
              tile_inverse_conv3d_general(t, tgt, wi, kernel_size=3,
                                          stride=2, padding=1), src)


if __name__ == '__main__':
    main()
