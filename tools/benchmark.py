#!/usr/bin/env python
"""Inference FPS benchmark for any config (ref: tools/analysis_tools/
benchmark.py:35-82 — warmup then timed pure-inference iterations)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--num-points', type=int, default=30000)
    p.add_argument('--batch-size', type=int, default=1)
    p.add_argument('--warmup', type=int, default=10)
    p.add_argument('--iters', type=int, default=50)
    p.add_argument('--points-dist', default='lidar',
                   choices=['lidar', 'uniform'],
                   help='point generator: "lidar" = surface-clustered '
                        'simulated scan (representative of real frames, '
                        'the default); "uniform" = uniform random (the '
                        'legacy protocol; pathological for sparsity-'
                        'exploiting backends)')
    args = p.parse_args()

    import jax
    # persistent compile cache (same as bench.py) — remote-TPU compiles
    # are minutes cold, seconds warm
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    if os.environ.get('TPU_BEV3D_PLATFORM'):
        jax.config.update('jax_platforms',
                          os.environ['TPU_BEV3D_PLATFORM'])
    import jax.numpy as jnp
    from tpu_bev3d.config import Config
    from tpu_bev3d.testing import (build_detector_from_cfg,
                                   create_detector_inputs)

    cfg = Config.fromfile(args.config)
    model = build_detector_from_cfg(cfg.model)
    pdim = int(cfg.model.get('voxel_encoder', {}).get(
        'in_channels', cfg.model.get('voxel_encoder', {}).get(
            'num_features', 4)))
    # one DISTINCT batch per timed iteration: repeated identical args
    # report impossibly fast times through the remote-TPU tunnel
    # (appears memoized — see CLAUDE.md timing notes)
    batches = []
    for i in range(args.iters):
        b = create_detector_inputs(
            rng=__import__('numpy').random.default_rng(i),
            batch_size=args.batch_size, num_points=args.num_points,
            point_dim=pdim,
            pc_range=tuple(cfg.model.point_cloud_range),
            distribution=args.points_dist)
        batches.append({k: jnp.asarray(v) for k, v in b.items()})
    variables = jax.jit(lambda r, b: model.init(r, b, mode='tensor'))(
        jax.random.PRNGKey(0), batches[0])
    # Scan-chained throughput: ONE jitted call runs every frame
    # back-to-back on device (lax.scan over stacked distinct batches)
    # and returns a single reduction that float() hard-reads back.
    # Rationale (docs/benchmarks.md): per-frame block_until_ready
    # returns early for some zoo graphs on the remote tunnel (reported
    # sub-ms FPS), and chaining per-output readbacks pays ~100 tiny
    # dispatches. One call + one readback = pure device throughput.
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

    @jax.jit
    def run_all(v, bs):
        def body(carry, b):
            out = model.apply(v, b, mode='predict')
            return carry + jnp.sum(out['bboxes']), 0
        acc, _ = jax.lax.scan(body, jnp.float32(0), bs)
        return acc

    # warmup/compile on a perturbed copy (the tunnel memoizes repeated
    # identical calls)
    warm = jax.tree_util.tree_map(
        lambda x: x + jnp.asarray(0.001, x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, stacked)
    _ = float(run_all(variables, warm))
    t0 = time.perf_counter()
    _ = float(run_all(variables, stacked))
    dt = time.perf_counter() - t0
    fps = args.iters * args.batch_size / dt
    print(f'{fps:.2f} frames/s ({dt / args.iters * 1000:.2f} ms/iter, '
          f'{args.iters} frames scan-chained, one readback)')


if __name__ == '__main__':
    main()
