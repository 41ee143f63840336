#!/usr/bin/env python
"""Part-A2 train-step attribution probe (VERDICT r4 item 1): where do the
~3 s/step (flat) / ~11 s/step (tile) go? Times the SparseUNet middle
encoder (fwd and fwd+bwd, both backends) and the RoI head in isolation
with the scan-chained protocol (the only trustworthy instrument on the
tunnel — see CLAUDE.md perf facts).

Run on the real TPU:  python tools/probe_parta2_parts.py [--only unet_tile]
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
    ap.add_argument('--only', default=None,
                    help='comma list: unet_tile,unet_flat,roi,rpn')
    ap.add_argument('--bwd', action='store_true', default=True)
    args = ap.parse_args()
    only = set(args.only.split(',')) if args.only else None

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    if os.environ.get('TPU_BEV3D_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['TPU_BEV3D_PLATFORM'])

    from tpu_bev3d.config import Config
    from tpu_bev3d.registry import MODELS
    import tpu_bev3d.models  # noqa: F401
    from tpu_bev3d.testing import create_detector_inputs
    from tpu_bev3d.ops.voxelize import batch_hard_voxelize

    cfg = Config.fromfile('configs/parta2/parta2_kitti_3class.py')
    m = cfg.model
    B = 2
    batch = create_detector_inputs(
        rng=np.random.default_rng(0), batch_size=B, num_points=20000,
        point_dim=4, pc_range=tuple(m.point_cloud_range), num_classes=3,
        distribution='lidar')
    vox = jax.jit(lambda p, pm: batch_hard_voxelize(
        p, pm, voxel_size=tuple(m.voxel_size),
        pc_range=tuple(m.point_cloud_range), max_points=m.max_num_points,
        max_voxels_per_sample=m.max_voxels))(
            jnp.asarray(batch['points']), jnp.asarray(batch['points_mask']))
    # HardSimpleVFE = masked mean over points per voxel
    npts = jnp.maximum(vox['num_points'], 1)[:, None].astype(jnp.float32)
    vfeat = jnp.sum(vox['voxels'], axis=1) / npts
    coords = vox['coords']
    print('voxels:', vfeat.shape, 'valid:',
          int(jnp.sum(coords[:, 0] >= 0)), flush=True)

    def bench(tag, fn, *xs):
        @jax.jit
        def run(seed, *ys):
            def body(c, _):
                out = fn(c, *ys)
                s = jnp.sum(jnp.abs(
                    jax.flatten_util.ravel_pytree(out)[0]
                ).astype(jnp.float32))
                return c + 1e-9 * s, 0
            c, _ = jax.lax.scan(body, seed, None, length=args.reps)
            return c
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.float32(1.0), *xs))
        print(f'  [{tag}] compile+first: {time.perf_counter()-t0:.1f}s',
              flush=True)
        best = 1e9
        for r in range(3):
            t0 = time.perf_counter()
            v = float(run(jnp.float32(1.0 + r * 0.1), *xs))
            dt = (time.perf_counter() - t0) / args.reps
            best = min(best, dt)
        print(f'  [{tag}] {best*1000:.1f} ms/iter  (chk {v:.3e})',
              flush=True)

    def unet_cfg(backend):
        c = dict(m.middle_encoder)
        if backend == 'flat':
            for k in ('backend', 'tile_shape', 'tile_capacities',
                      'tile_dtype'):
                c.pop(k, None)
        return c

    for backend in ('tile', 'flat'):
        key = f'unet_{backend}'
        if only and key not in only:
            continue
        unet = MODELS.build(unet_cfg(backend))
        vs = jax.jit(lambda k, f, c: unet.init(k, f, c, B))(
            jax.random.PRNGKey(0), vfeat, coords)
        print(f'== SparseUNet {backend} ==', flush=True)

        def fwd(c, vf_, co_, vs_=vs, unet_=unet):
            out = unet_.apply(vs_, vf_ * c, co_, B)
            return (out['spatial_features'], out['seg_features'])
        bench(f'{key}_fwd', fwd, vfeat, coords)

        def fwdbwd(c, vf_, co_, vs_=vs, unet_=unet):
            def loss(p):
                out = unet_.apply({**vs_, 'params': p}, vf_ * c, co_, B)
                return (jnp.sum(out['spatial_features'] ** 2)
                        + jnp.sum(out['seg_features'] ** 2))
            return jax.grad(loss)(vs_['params'])
        bench(f'{key}_fwdbwd', fwdbwd, vfeat, coords)

    if not only or 'roi' in only:
        print('== RoI head ==', flush=True)
        roi = MODELS.build(dict(m.roi_head))
        V = coords.shape[0]
        unet_out = dict(
            seg_features=jnp.zeros((V, 16), jnp.float32),
            seg_coords=coords, seg_valid=coords[:, 0] >= 0,
            seg_logit=jnp.zeros((V,), jnp.float32),
            part_reg=jnp.zeros((V, 3), jnp.float32))
        R = 128
        rng = np.random.default_rng(1)
        props = dict(
            bboxes=jnp.asarray(rng.uniform(0, 1, (B, R, 7)).astype(
                np.float32) * np.array([60, 60, 2, 4, 2, 2, 6],
                                       np.float32)),
            scores=jnp.ones((B, R), jnp.float32),
            labels=jnp.zeros((B, R), jnp.int32),
            mask=jnp.ones((B, R), bool))
        vs = jax.jit(roi.init)(jax.random.PRNGKey(0), unet_out, props)

        def roifb(c, so, vs_=vs, roi_=roi):
            def loss(p):
                uo = dict(unet_out, seg_features=so * c)
                out = roi_.apply({**vs_, 'params': p}, uo, props)
                return jnp.sum(out['scores']) + jnp.sum(out['bboxes'] ** 2)
            return jax.grad(loss)(vs_['params'])
        bench('roi_fwdbwd', roifb, unet_out['seg_features'] + 1.0)


if __name__ == '__main__':
    import jax.flatten_util  # noqa: F401
    main()
