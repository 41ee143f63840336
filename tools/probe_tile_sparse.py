#!/usr/bin/env python
"""Per-component timing probe for the tile-sparse backend on the real
chip. Each component runs REPS times inside one jitted lax.scan with a
perturbed carry (the tunnel memoizes identical args), one readback at the
end — the only trustworthy instrument on this tunnel (docs/benchmarks.md).
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
    from tpu_bev3d.ops.tile_sparse import (_build_halo, sparse_conv3d_tile,
                                           subm_conv3d_tile, tile_dense,
                                           tiles_from_sparse)
    from tpu_bev3d.testing.model_utils import lidar_scan_points

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

    def timed(name, fn, *args):
        jf = jax.jit(fn)
        out = jax.block_until_ready(jf(*args))           # compile
        t0 = time.perf_counter()
        out = jf(*args)
        s = jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) * 1000
        print(f'{name:34s} {(dt - 23) / REPS:8.2f} ms/op   '
              f'(total {dt:.0f} ms, {REPS} reps)')

    def scan_over(fn, x0):
        def run(x0):
            def body(x, _):
                return fn(x), 0
            y, _ = jax.lax.scan(body, x0, None, length=REPS)
            return jax.tree_util.tree_map(
                lambda a: jnp.sum(jnp.abs(a).astype(jnp.float32)), y)
        return run, x0

    for C in (16, 64):
        feats = rng.standard_normal((cap, C)).astype(np.float32)
        st = SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                          (41, 1600, 1408), 1)
        T = 4096
        tt = tiles_from_sparse(st, (2, 8, 8), capacity=T)
        tt = jax.tree_util.tree_map(jnp.asarray, tt)
        print(f'--- C={C}; active tiles '
              f'{int(np.asarray(tt.valid).sum())}/{T}')
        w = jnp.asarray(rng.standard_normal((27, C, C)).astype(np.float32)
                        * 0.05)

        # tiles_from_sparse
        def build(f):
            t2 = tiles_from_sparse(
                SparseTensor(f, jnp.asarray(coords), (41, 1600, 1408), 1),
                (2, 8, 8), capacity=T)
            return f + 1e-9 * jnp.sum(t2.features)
        run, x0 = scan_over(build, jnp.asarray(feats))
        timed('tiles_from_sparse', run, x0)

        # halo only
        def halo(f):
            hl = _build_halo(f, tt.nb_idx, (1, 1, 1))
            return f + 1e-6 * hl[:, 1:-1, 1:-1, 1:-1]
        run, x0 = scan_over(halo, tt.features)
        timed('halo build', run, x0)

        # subm conv
        def subm(f):
            t2 = subm_conv3d_tile(
                type(tt)(f, tt.mask, tt.tile_coords, tt.nb_idx,
                         tt.spatial_shape, tt.batch_size), w)
            return f + 1e-3 * t2.features
        run, x0 = scan_over(subm, tt.features)
        timed('subm conv CxC', run, x0)

        # strided conv (returns same-capacity tile tensor, reuse features)
        def strided(f):
            t2 = sparse_conv3d_tile(
                type(tt)(f, tt.mask, tt.tile_coords, tt.nb_idx,
                         tt.spatial_shape, tt.batch_size), w,
                stride=2, padding=1, rule='spconv')
            return f + 1e-3 * jnp.sum(t2.features) * jnp.ones_like(f)
        run, x0 = scan_over(strided, tt.features)
        timed('strided conv (spconv rule)', run, x0)

    # final dense (stage-4 shape: (2, 200, 176) grid, C=128)
    st4 = SparseTensor(
        jnp.asarray(rng.standard_normal((cap, 128)).astype(np.float32)),
        jnp.asarray(np.concatenate(
            [coords[:, :1],
             coords[:, 1:] // np.array([16, 8, 8], np.int32)], -1)
            * np.where(coords[:, :1] >= 0, 1, 1)),
        (3, 200, 176), 1)
    tt4 = tiles_from_sparse(st4, (2, 8, 8), capacity=T)

    def dense(f):
        d = tile_dense(type(tt4)(f, tt4.mask, tt4.tile_coords, tt4.nb_idx,
                                 tt4.spatial_shape, tt4.batch_size))
        return f + 1e-6 * jnp.sum(d) * jnp.ones_like(f)
    run, x0 = scan_over(dense, tt4.features)
    timed('tile_dense (C=128)', run, x0)


if __name__ == '__main__':
    main()
