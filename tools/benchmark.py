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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_bev3d.config import Config
    from tpu_bev3d.testing import (build_detector_from_cfg,
                                   create_detector_inputs)

    cfg = Config.fromfile(args.config)
    model = build_detector_from_cfg(cfg.model)
    pdim = int(cfg.model.get('voxel_encoder', {}).get(
        'in_channels', cfg.model.get('voxel_encoder', {}).get(
            'num_features', 4)))
    batches = []
    for i in range(4):
        b = create_detector_inputs(
            rng=__import__('numpy').random.default_rng(i),
            batch_size=args.batch_size, num_points=args.num_points,
            point_dim=pdim,
            pc_range=tuple(cfg.model.point_cloud_range))
        batches.append({k: jnp.asarray(v) for k, v in b.items()})
    variables = jax.jit(lambda r, b: model.init(r, b, mode='tensor'))(
        jax.random.PRNGKey(0), batches[0])
    fn = jax.jit(lambda v, b: model.apply(v, b, mode='predict'))
    for i in range(args.warmup):
        jax.block_until_ready(fn(variables, batches[i % 4]))
    t0 = time.perf_counter()
    for i in range(args.iters):
        jax.block_until_ready(fn(variables, batches[i % 4]))
    dt = time.perf_counter() - t0
    fps = args.iters * args.batch_size / dt
    print(f'{fps:.2f} frames/s ({dt / args.iters * 1000:.2f} ms/iter)')


if __name__ == '__main__':
    main()
