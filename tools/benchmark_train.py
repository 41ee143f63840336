#!/usr/bin/env python
"""Training-throughput benchmark (samples/s) for any config on synthetic
batches (ref: BenchmarkHook, mmdet3d/engine/hooks/benchmark_hook.py:14-38;
BASELINE.md train-throughput rows)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--num-points', type=int, default=20000)
    p.add_argument('--iters', type=int, default=20)
    p.add_argument('--points-dist', default='uniform',
                   choices=['uniform', 'lidar'],
                   help='synthetic cloud generator; "lidar" = surface-'
                        'clustered (representative for sparsity-'
                        'exploiting backends — benchmark.py\'s default); '
                        '"uniform" kept default for continuity with '
                        'earlier train rows')
    args = p.parse_args()

    import jax
    import numpy as np
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '..', '.jax_cache'))
    from tpu_bev3d.config import Config
    from tpu_bev3d.engine import (build_optimizer, create_train_state,
                                  make_train_step)
    from tpu_bev3d.testing import (build_detector_from_cfg,
                                   create_detector_inputs)

    cfg = Config.fromfile(args.config)
    bsz = args.batch_size or cfg.get('train_cfg', {}).get('batch_size', 2)
    model = build_detector_from_cfg(cfg.model)
    ve = cfg.model.get('voxel_encoder', {}) or {}
    pdim = int(ve.get('in_channels', ve.get('num_features', 4)))
    multimodal = 'img_backbone' in cfg.model

    # host-side batches; device_put FRESH buffers every step and block per
    # step — reused device buffers have produced memoized (impossible)
    # timings through the remote-device tunnel
    def mk_host(seed):
        if multimodal:
            from tpu_bev3d.testing import create_multimodal_inputs
            vt = cfg.model.get('view_transform', {}) or {}
            return create_multimodal_inputs(
                rng=np.random.default_rng(seed), batch_size=bsz,
                num_points=args.num_points, point_dim=5, num_classes=10,
                image_size=tuple(vt.get('image_size', (256, 704))),
                pc_range=tuple(cfg.model.point_cloud_range),
                with_velocity=True)
        # GT box dim must match the head's code: a with_velocity head
        # slices b[:, 7:9], which on 7-dim boxes silently yields a 0-wide
        # anno and a code-weight broadcast error in loss_by_feat
        wv = bool(cfg.model.get('bbox_head', {}).get('with_velocity',
                                                     False))
        # indoor models (VoteNet etc.) carry no point_cloud_range —
        # synthesize a room-scale cloud instead of an outdoor scan
        pcr = cfg.model.get('point_cloud_range')
        pcr = tuple(pcr) if pcr is not None else (-4.0, -4.0, -2.0,
                                                  4.0, 4.0, 2.0)
        ncls = len(cfg.get('class_names', [])) or 3
        return create_detector_inputs(
            rng=np.random.default_rng(seed), batch_size=bsz,
            num_points=args.num_points, point_dim=pdim,
            pc_range=pcr, num_classes=ncls,
            with_velocity=wv, distribution=args.points_dist)

    host_batches = [mk_host(i) for i in range(4)]

    def put(i):
        return {k: jax.device_put(v) for k, v in
                host_batches[i % 4].items()}

    tcfg = cfg.get('train_cfg', {})
    tx, _ = build_optimizer(tcfg.get('optimizer', {}), 1000,
                            tcfg.get('scheduler'),
                            tcfg.get('clip_grad_norm'))
    state = create_train_state(model, put(0), tx)
    step = make_train_step(model, tx, donate=False)
    # pre-upload distinct batches so only compute is timed
    dev_batches = [put(i) for i in range(args.iters)]
    for i in range(3):
        state, m = step(state, dev_batches[i])
        _ = float(m['loss'])
    # throughput protocol: enqueue the whole chain (each step depends on
    # the previous state, so the device runs them back-to-back) and read
    # every loss at the end. float() of each loss forces real execution —
    # block_until_ready alone under-reports train graphs through the
    # remote-device tunnel, and identical repeated inputs get memoized
    # (hence distinct batches per step).
    t0 = time.perf_counter()
    losses = []
    for i in range(args.iters):
        state, m = step(state, dev_batches[i])
        losses.append(m['loss'])
    total = sum(float(l) for l in losses)
    dt = time.perf_counter() - t0
    assert total == total
    sps = args.iters * bsz / dt
    print(f'{sps:.2f} train samples/s/chip '
          f'({dt / args.iters * 1000:.1f} ms/step, bs={bsz})')


if __name__ == '__main__':
    main()
