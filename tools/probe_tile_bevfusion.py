#!/usr/bin/env python
"""Per-component timing probe for the tile-sparse backend at BEVFusion
nuScenes scale (sparse_shape [41,1440,1440], encoder_channels
((16,16,32),(32,32,64),(64,64,128),(128,128)), ref
projects/BEVFusion/bevfusion/sparse_encoder.py:14).

Same protocol as tools/probe_tile_sparse.py (the SECOND-KITTI probe):
REPS executions inside one jitted lax.scan with a perturbed carry, one
readback — the only trustworthy per-op instrument on this tunnel.

Feeds the REAL nuScenes demo cloud so tile occupancy is representative.
--cap sets the stage-0 tile capacity (probe the shipped 20480 vs the
single-sweep-sized 12288); --factor the per-stage shrink.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
REPS = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cap', type=int, default=20480)
    ap.add_argument('--factor', type=float, default=0.5)
    ap.add_argument('--caps', type=str, default=None,
                    help='explicit per-stage tile capacities, comma list '
                         '(e.g. the serving config\'s 9360,10872,6536,2752)'
                         ' — overrides --cap/--factor')
    ap.add_argument('--max-voxels', type=int, default=36000)
    args = ap.parse_args()

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

    CDT = jnp.bfloat16
    TILE = (2, 4, 4)
    SHAPE = (41, 1440, 1440)
    rng = np.random.default_rng(0)
    binf = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                        'tests', 'data', 'demo', 'nuscenes',
                        'n015-2018-07-24-11-22-45+0800__LIDAR_TOP__'
                        '1532402927647951.pcd.bin')
    pts = np.fromfile(binf, np.float32).reshape(-1, 5)[:, :3]
    lo, hi = np.array([-54, -54, -5.]), np.array([54, 54, 3.])
    pts = pts[((pts >= lo) & (pts < hi)).all(1)]
    vox = np.unique(np.floor((pts - lo) / np.array([0.075, 0.075, 0.2]))
                    .astype(np.int32), axis=0)
    n = min(len(vox), args.max_voxels)
    cap_v = args.max_voxels
    coords = np.full((cap_v, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1] = vox[:n, 2]
    coords[:n, 2] = vox[:n, 1]
    coords[:n, 3] = vox[:n, 0]
    print(f'{n} real voxels, voxel table cap {cap_v}, '
          f'tile cap {args.cap} x{args.factor}')

    if args.caps:
        caps = [int(c) for c in args.caps.split(',')]
        assert len(caps) == 4, '--caps needs 4 per-stage values'
    else:
        caps = [args.cap]
        for _ in range(3):
            caps.append(max(-(-int(caps[-1] * args.factor) // 8) * 8, 8))

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
        print(f'{name:40s} {(dt - 23) / REPS:8.2f} ms/op   '
              f'(total {dt:.0f} ms, {REPS} reps)')
        sys.stdout.flush()

    def mkw(k, ci, co):
        return jnp.asarray(
            (rng.standard_normal((k, ci, co)) * 0.05).astype(np.float32))

    feats = rng.standard_normal((cap_v, 16)).astype(np.float32)
    pads = [1, 1, (0, 1, 1)]

    @jax.jit
    def chain(f):
        t1 = tiles_from_sparse(
            SparseTensor(f, jnp.asarray(coords), SHAPE, 1),
            TILE, capacity=caps[0])
        t2 = sparse_conv3d_tile(t1, mkw(27, 16, 32), stride=2,
                                padding=pads[0], rule='spconv',
                                out_capacity=caps[1], compute_dtype=CDT)
        t3 = sparse_conv3d_tile(t2, mkw(27, 32, 64), stride=2,
                                padding=pads[1], rule='spconv',
                                out_capacity=caps[2], compute_dtype=CDT)
        t4 = sparse_conv3d_tile(t3, mkw(27, 64, 128), stride=2,
                                padding=pads[2], rule='spconv',
                                out_capacity=caps[3], compute_dtype=CDT)
        return t1, t2, t3, t4

    t1, t2, t3, t4 = jax.block_until_ready(chain(jnp.asarray(feats)))
    for i, t in enumerate((t1, t2, t3, t4)):
        print(f'  stage{i+1}: T={t.tile_coords.shape[0]} active_tiles='
              f'{int((np.asarray(t.tile_coords)[:, 0] >= 0).sum())} '
              f'fill={100 * float(np.asarray(t.mask).mean()):.1f}%')

    def widen(t, c):
        T, S = t.features.shape[0], t.S
        f = jnp.asarray(rng.standard_normal((T, S * c)).astype(np.float32))
        return t.replace_features(f * jnp.repeat(t.mask, c, axis=1))

    t2, t3, t4 = widen(t2, 32), widen(t3, 64), widen(t4, 128)

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
            SparseTensor(f, jnp.asarray(coords), SHAPE, 1),
            TILE, capacity=caps[0])
        return f + 1e-9 * jnp.sum(tt.features)

    timed(f'tiles_from_sparse cap{caps[0]}', build, jnp.asarray(feats))
    # the encoder runs conv_input (5->16 subm) + 2 subm per stage 0-2 and
    # 2 subm at stage 3; probe one of each width
    timed(f'subm 16x16  T{caps[0]}', sub(t1, mkw(27, 16, 16)), t1.features)
    timed(f'down 16->32 T{caps[0]}->{caps[1]}',
          strided(t1, mkw(27, 16, 32), caps[1], pads[0]), t1.features)
    timed(f'subm 32x32  T{caps[1]}', sub(t2, mkw(27, 32, 32)), t2.features)
    timed(f'down 32->64 T{caps[1]}->{caps[2]}',
          strided(t2, mkw(27, 32, 64), caps[2], pads[1]), t2.features)
    timed(f'subm 64x64  T{caps[2]}', sub(t3, mkw(27, 64, 64)), t3.features)
    timed(f'down 64->128 T{caps[2]}->{caps[3]}',
          strided(t3, mkw(27, 64, 128), caps[3], pads[2]), t3.features)
    timed(f'subm 128x128 T{caps[3]}', sub(t4, mkw(27, 128, 128)),
          t4.features)

    def convout(f):
        tt = t4.replace_features(f)
        o = sparse_conv3d_tile(tt, mkw(3, 128, 128),
                               kernel_size=(3, 1, 1), stride=(2, 1, 1),
                               padding=0, rule='spconv',
                               out_capacity=caps[3], compute_dtype=CDT)
        return f + 1e-3 * jnp.sum(o.features.astype(jnp.float32)) \
            * jnp.ones_like(f)
    timed('conv_out 128->128 (3,1,1)', convout, t4.features)

    def dense(f):
        return f + 1e-6 * jnp.sum(tile_dense(t4.replace_features(f))
                                  .astype(jnp.float32)) * jnp.ones_like(f)
    timed('tile_dense s4 (BEV collapse)', dense, t4.features)


if __name__ == '__main__':
    main()
