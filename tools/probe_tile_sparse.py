#!/usr/bin/env python
"""Per-component timing probe for the tile-sparse backend on the real
chip. Each component runs REPS times inside one jitted lax.scan with a
perturbed carry (the tunnel memoizes identical args), one readback at the
end — the only trustworthy instrument on this tunnel (docs/benchmarks.md).

Mirrors the SECOND-KITTI encoder chain at the shipped config params
(tile_shape (2,4,4), cap 8192, tile_stage_factor 0.5, bf16 compute) so the
per-op sum can be compared against the end-to-end bench.
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
    from tpu_bev3d.ops.sparse_conv import SparseTensor
    from tpu_bev3d.ops.tile_sparse import (sparse_conv3d_tile,
                                           subm_conv3d_tile, tile_dense,
                                           tiles_from_sparse)
    from tpu_bev3d.testing.model_utils import lidar_scan_points

    CDT = jnp.bfloat16
    TILE = (2, 4, 4)
    rng = np.random.default_rng(0)
    pts = lidar_scan_points(rng, 30000, (0, -40, -3, 70.4, 40, 1))
    vox = ((pts - np.array([0, -40, -3])) /
           np.array([0.05, 0.05, 0.1])).astype(np.int32)
    lin = (vox[:, 2].astype(np.int64) * (1600 * 1408)
           + vox[:, 1] * 1408 + vox[:, 0])
    _, ui = np.unique(lin, return_index=True)
    vox = vox[ui][:16000]
    n = len(vox)
    cap = 16000
    coords = np.full((cap, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1] = vox[:n, 2]
    coords[:n, 2] = vox[:n, 1]
    coords[:n, 3] = vox[:n, 0]
    print(f'{n} voxels')

    def timed(name, fn, x0):
        def run(x0):
            def body(x, _):
                return fn(x), 0
            y, _ = jax.lax.scan(body, x0, None, length=REPS)
            return jax.tree_util.tree_map(
                lambda a: jnp.sum(jnp.abs(a).astype(jnp.float32)), y)
        jf = jax.jit(run)
        jax.block_until_ready(jf(x0))                    # compile
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x0))
        dt = (time.perf_counter() - t0) * 1000
        print(f'{name:38s} {(dt - 23) / REPS:8.2f} ms/op   '
              f'(total {dt:.0f} ms, {REPS} reps)')
        sys.stdout.flush()

    def mkw(k, ci, co):
        return jnp.asarray(
            (rng.standard_normal((k, ci, co)) * 0.05).astype(np.float32))

    # build the real per-stage tile tensors by running the chain forward
    feats = rng.standard_normal((cap, 16)).astype(np.float32)
    st = SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                      (41, 1600, 1408), 1)

    @jax.jit
    def chain(f):
        t1 = tiles_from_sparse(
            SparseTensor(f, jnp.asarray(coords), (41, 1600, 1408), 1),
            TILE, capacity=8192)
        t2 = sparse_conv3d_tile(t1, mkw(27, 16, 16), stride=2, padding=1,
                                rule='spconv', out_capacity=4096,
                                compute_dtype=CDT)
        t3 = sparse_conv3d_tile(t2, mkw(27, 16, 32), stride=2, padding=1,
                                rule='spconv', out_capacity=2048,
                                compute_dtype=CDT)
        t4 = sparse_conv3d_tile(t3, mkw(27, 32, 64), stride=2,
                                padding=(0, 1, 1), rule='spconv',
                                out_capacity=1024, compute_dtype=CDT)
        return t1, t2, t3, t4

    t1, t2, t3, t4 = jax.block_until_ready(chain(jnp.asarray(feats)))
    for i, t in enumerate((t1, t2, t3, t4)):
        print(f'  stage{i+1}: T={t.tile_coords.shape[0]} active='
              f'{int(np.asarray(t.valid).sum())} '
              f'fill={100 * float(np.asarray(t.mask).mean()):.1f}%')

    # widen channels to the stage plan: s1=16, s2=32, s3=64, s4=64
    def widen(t, c):
        T, S = t.features.shape[0], t.S
        f = jnp.asarray(rng.standard_normal((T, S * c))
                        .astype(np.float32))
        f = f * jnp.repeat(t.mask, c, axis=1)
        return t.replace_features(f)

    t2 = widen(t2, 32)
    t3 = widen(t3, 64)
    t4 = widen(t4, 64)

    def sub(t, w):
        def fn(f):
            o = subm_conv3d_tile(t.replace_features(f), w,
                                 compute_dtype=CDT)
            return f + 1e-3 * o.features
        return fn

    def strided(t, w, ocap, pad=1):
        def fn(f):
            o = sparse_conv3d_tile(t.replace_features(f), w, stride=2,
                                   padding=pad, rule='spconv',
                                   out_capacity=ocap, compute_dtype=CDT)
            return f + 1e-3 * jnp.sum(o.features.astype(jnp.float32)) \
                * jnp.ones_like(f)
        return fn

    def build(f):
        tt = tiles_from_sparse(
            SparseTensor(f, jnp.asarray(coords), (41, 1600, 1408), 1),
            TILE, capacity=8192)
        return f + 1e-9 * jnp.sum(tt.features)

    timed('tiles_from_sparse cap8192', build, jnp.asarray(feats))
    timed('subm 16x16  T8192 s1', sub(t1, mkw(27, 16, 16)), t1.features)
    timed('down 16->16 T8192->4096', strided(t1, mkw(27, 16, 16), 4096),
          t1.features)
    timed('subm 32x32  T4096 s2', sub(t2, mkw(27, 32, 32)), t2.features)
    timed('down 32->32 T4096->2048', strided(t2, mkw(27, 32, 32), 2048),
          t2.features)
    timed('subm 64x64  T2048 s3', sub(t3, mkw(27, 64, 64)), t3.features)
    timed('down 64->64 T2048->1024',
          strided(t3, mkw(27, 64, 64), 1024, pad=(0, 1, 1)), t3.features)
    timed('subm 64x64  T1024 s4', sub(t4, mkw(27, 64, 64)), t4.features)

    def convout(f):
        tt = t4.replace_features(f)
        o = sparse_conv3d_tile(tt, mkw(3, 64, 128), kernel_size=(3, 1, 1),
                               stride=(2, 1, 1), padding=0, rule='spconv',
                               out_capacity=1024, compute_dtype=CDT)
        return f + 1e-3 * jnp.sum(o.features.astype(jnp.float32)) \
            * jnp.ones_like(f)
    timed('conv_out 64->128 (3,1,1)', convout, t4.features)

    def dense(f):
        return f + 1e-6 * jnp.sum(tile_dense(t4.replace_features(f))) \
            * jnp.ones_like(f)
    timed('tile_dense s4', dense, t4.features)


if __name__ == '__main__':
    main()
