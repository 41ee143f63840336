#!/usr/bin/env python
"""Bisect subm_conv3d_tile: neighbor-row gather vs halo assembly vs conv
at BEVFusion stage-1 (T=12288, C=16) and stage-4 (T=2664, C=128) scale.

Scan-chained protocol (the only trustworthy per-op instrument here)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
REPS = 16


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
    from jax import lax
    from tpu_bev3d.ops.sparse_conv import SparseTensor
    from tpu_bev3d.ops import tile_sparse as ts

    rng = np.random.default_rng(0)

    def timed(name, fn, x0):
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
        print(f'{name:44s} {(dt - 23) / REPS:8.2f} ms/op')
        sys.stdout.flush()

    binf = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                        'tests', 'data', 'demo', 'nuscenes',
                        'n015-2018-07-24-11-22-45+0800__LIDAR_TOP__'
                        '1532402927647951.pcd.bin')
    pts = np.fromfile(binf, np.float32).reshape(-1, 5)[:, :3]
    lo, hi = np.array([-54, -54, -5.]), np.array([54, 54, 3.])
    pts = pts[((pts >= lo) & (pts < hi)).all(1)]
    vox = np.unique(np.floor((pts - lo) / np.array([0.075, 0.075, 0.2]))
                    .astype(np.int32), axis=0)
    n = len(vox)
    coords = np.full((36000, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1] = vox[:, 2]
    coords[:n, 2] = vox[:, 1]
    coords[:n, 3] = vox[:, 0]
    feats = rng.standard_normal((36000, 16)).astype(np.float32)
    st = SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                      (41, 1440, 1440), 1)

    for (cap, C) in ((12288, 16), (12288, 64), (2664, 128)):
        tt = ts.tiles_from_sparse(st, (2, 4, 4), capacity=cap)
        tt = jax.block_until_ready(jax.jit(
            lambda f: tt.replace_features(
                jnp.zeros((cap, tt.S * C), jnp.bfloat16)))(0))
        T, S = cap, tt.S
        f0 = jnp.asarray(rng.standard_normal((T, S * C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((27, C, C)) * 0.05,
                        jnp.bfloat16)
        need = [i for i, d in enumerate(ts._DIRS) if tuple(d) != (0, 0, 0)]
        nb26 = jnp.minimum(tt.nb_idx[jnp.asarray(need)], T)

        def gather_only(f):
            xp = jnp.concatenate([f, jnp.zeros((1, S * C), f.dtype)], 0)
            nbs = ts._gather_rows(xp, nb26).reshape(26, T, S * C)
            return f + jnp.mean(nbs, 0) * jnp.bfloat16(1e-3)
        timed(f'T{T} C{C}: 26-row gather only', gather_only, f0)

        def halo_only(f):
            tz, ty, tx = 2, 4, 4
            xp = jnp.concatenate([f, jnp.zeros((1, S * C), f.dtype)], 0)
            nbs = ts._gather_rows(xp, nb26).reshape(26, T, S * C)
            pos = {tuple(ts._DIRS[i]): j for j, i in enumerate(need)}
            pieces = []
            for z in range(-1, tz + 1):
                for y in range(-1, ty + 1):
                    for x in range(-1, tx + 1):
                        d = tuple((0 if 0 <= c < t else (-1 if c < 0 else 1))
                                  for c, t in zip((z, y, x), (tz, ty, tx)))
                        cz, cy, cx = (c - dd * t for c, dd, t in
                                      zip((z, y, x), d, (tz, ty, tx)))
                        cl = (cz * ty + cy) * tx + cx
                        src = f if d == (0, 0, 0) else nbs[pos[d]]
                        pieces.append(lax.slice_in_dim(
                            src, cl * C, (cl + 1) * C, axis=1))
            halo = ts._assemble(pieces, T, (tz + 2, ty + 2, tx + 2), C)
            return f + halo[:, 1:1 + tz, 1:1 + ty, 1:1 + tx].reshape(
                T, S * C) * jnp.bfloat16(1e-3)
        timed(f'T{T} C{C}: gather + halo assemble', halo_only, f0)

        def full(f):
            o = ts.subm_conv3d_tile(tt.replace_features(f), w)
            return f + o.features * jnp.bfloat16(1e-3)
        timed(f'T{T} C{C}: full subm conv', full, f0)


if __name__ == '__main__':
    main()
