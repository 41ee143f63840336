#!/usr/bin/env python
"""Bisect the strided tile-sparse conv: time each internal phase of
sparse_conv3d_tile at stage-1 geometry (T=8192, tile (2,4,4), C=16,
rule='spconv') with the scan-chained protocol."""
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
    from jax import lax
    from tpu_bev3d.ops.sparse_conv import SparseTensor
    from tpu_bev3d.ops import tile_sparse as ts
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

    feats = rng.standard_normal((cap, 16)).astype(np.float32)
    t1 = jax.jit(lambda f: ts.tiles_from_sparse(
        SparseTensor(f, jnp.asarray(coords), (41, 1600, 1408), 1),
        TILE, capacity=8192))(jnp.asarray(feats))
    t1 = jax.block_until_ready(t1)
    w = jnp.asarray((rng.standard_normal((27, 16, 16)) * 0.05)
                    .astype(np.float32))

    def timed(name, fn, x0):
        def run(x0):
            def body(x, _):
                return fn(x), 0
            y, _ = jax.lax.scan(body, x0, None, length=REPS)
            return jax.tree_util.tree_map(
                lambda a: jnp.sum(jnp.abs(a).astype(jnp.float32)), y)
        jf = jax.jit(run)
        jax.block_until_ready(jf(x0))
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x0))
        dt = (time.perf_counter() - t0) * 1000
        print(f'{name:38s} {(dt - 23) / REPS:8.2f} ms/op   '
              f'(total {dt:.0f} ms)')
        sys.stdout.flush()

    grid = t1.tiles_grid
    B = 1
    T = 8192
    dil_dirs = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)
                if (a, b, c) != (0, 0, 0)]

    def mk(f):
        return type(t1)(f, t1.mask, t1.tile_coords, t1.nb_idx,
                        t1.spatial_shape, t1.batch_size)

    def consume(f, x):
        return f + 1e-3 * jnp.sum(x.astype(jnp.float32)) * jnp.ones_like(f)

    # 1. dilate alone
    def f_dilate(f):
        tt = ts._dilate_tiles(mk(f), dil_dirs)
        return consume(f, tt.features) + 1e-3 * jnp.sum(
            tt.nb_idx.astype(jnp.float32))
    timed('dilate(7 dirs) T8192', f_dilate, t1.features)

    # 2. table_from_candidates alone on the dilated candidate list
    def f_table(f):
        tt = mk(f)
        valid = tt.valid
        dirs = np.concatenate([np.zeros((1, 3), np.int32),
                               np.asarray(dil_dirs, np.int32)], 0)
        D = len(dirs)
        cand_sp = (tt.tile_coords[None, :, 1:]
                   + jnp.asarray(dirs, jnp.int32)[:, None, :])
        cand = jnp.concatenate(
            [jnp.broadcast_to(tt.tile_coords[None, :, :1], (D, T, 1)),
             cand_sp], -1).reshape(D * T, 4)
        ok = (jnp.broadcast_to(valid[None], (D, T)).reshape(-1)
              & jnp.all((cand[:, 1:] >= 0)
                        & (cand[:, 1:] < jnp.asarray(grid, jnp.int32)),
                        -1))
        tc, smap = ts._table_from_candidates(cand, ok, grid, B, T)
        return (consume(f, tc) + 1e-3 * jnp.sum(f * 0)
                + 1e-9 * jnp.sum(smap.astype(jnp.float32))
                * jnp.ones_like(f)[0, 0, 0, 0, 0])
    timed('  table_from_cand (65k, 3M grid)', f_table, t1.features)

    # 3. neighbor table alone
    def f_nb(f):
        nb = ts._neighbor_table(t1.tile_coords, grid, B)
        return consume(f, nb)
    timed('  neighbor_table 27xT', f_nb, t1.features)

    # 4. feature halo build alone
    def f_halo(f):
        x = jnp.where(t1.mask[..., None], f, 0).astype(CDT)
        halo = ts._build_halo(x, t1.nb_idx, (1, 1, 1))
        return consume(f, halo)
    timed('  feat halo build', f_halo, t1.features)

    # 5. mask halo + pooling
    def f_mhalo(f):
        mh = ts._build_halo(t1.mask, t1.nb_idx, (1, 1, 1))
        mviews = ts._conv_views(mh, (3, 3, 3), (2, 2, 2), (1, 2, 2),
                                (0, 0, 0))
        r = jnp.zeros(mviews[0].shape, bool)
        for v in mviews:
            r = r | v
        return consume(f, r)
    timed('  mask halo + pool', f_mhalo, t1.features)

    # 6. views + GEMM alone
    def f_gemm(f):
        x = jnp.where(t1.mask[..., None], f, 0).astype(CDT)
        halo = ts._build_halo(x, t1.nb_idx, (1, 1, 1))
        views = ts._conv_views(halo, (3, 3, 3), (2, 2, 2), (1, 2, 2),
                               (0, 0, 0))
        out = ts._apply_weight(views, w, jnp.float32)
        return consume(f, out)
    timed('  halo+views+GEMM', f_gemm, t1.features)

    # 7. full strided floor rule (no dilation)
    def f_floor(f):
        o = ts.sparse_conv3d_tile(mk(f), w, stride=2, padding=1,
                                  rule='floor', out_capacity=4096,
                                  compute_dtype=CDT)
        return consume(f, o.features)
    timed('full strided rule=floor', f_floor, t1.features)

    # 8. full strided spconv rule
    def f_sp(f):
        o = ts.sparse_conv3d_tile(mk(f), w, stride=2, padding=1,
                                  rule='spconv', out_capacity=4096,
                                  compute_dtype=CDT)
        return consume(f, o.features)
    timed('full strided rule=spconv', f_sp, t1.features)


if __name__ == '__main__':
    main()
