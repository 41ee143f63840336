#!/usr/bin/env python
"""Inference FPS benchmark for any config (ref: tools/analysis_tools/
benchmark.py:35-82 — warmup then timed pure-inference iterations).

Handles every model family: lidar detectors, camera-only (PETR),
LiDAR+camera fusion, segmentors, and StreamPETR's STREAMING protocol
(the temporal memory pytree is threaded as the lax.scan carry, so the
timed run propagates memory across frames exactly like deployment —
ref projects/StreamPETR streaming inference)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def _bench_batches(cfg, iters, num_points, batch_size, dist):
    """One DISTINCT batch per timed iteration (repeated identical args
    report impossibly fast times through the remote-TPU tunnel): the
    modality-appropriate template from apis._make_init_batch with
    per-iteration fresh points/images."""
    import numpy as np
    from tpu_bev3d.apis.inference import _make_init_batch
    from tpu_bev3d.testing import create_detector_inputs

    template = _make_init_batch(cfg)
    pcr = tuple(cfg.model.get('point_cloud_range',
                              (-54, -54, -5, 54, 54, 3)))
    out = []
    for i in range(iters):
        rng = np.random.default_rng(i)
        b = {k: np.repeat(np.asarray(v), batch_size, axis=0)
             if np.asarray(v).ndim else np.asarray(v)
             for k, v in template.items()}
        if 'points' in b:
            det = create_detector_inputs(
                rng=rng, batch_size=batch_size, num_points=num_points,
                point_dim=b['points'].shape[-1], pc_range=pcr,
                distribution=dist)
            b['points'] = det['points']
            b['points_mask'] = det['points_mask']
        if 'imgs' in b:
            b['imgs'] = (b['imgs'] + rng.normal(
                0, 0.05, b['imgs'].shape)).astype(np.float32)
        out.append(b)
    return out


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
    p.add_argument('--scan-chunk', type=int, default=0,
                   help='split the scan protocol into ceil(iters/N) '
                        'jitted N-step scan calls, chained on device with '
                        'ONE final readback — same throughput protocol, '
                        'but avoids the deep-scan graphs that fault the '
                        'remote worker (docs/benchmarks.md known issue: '
                        'flat-sparse 30-step and segmentor 20-step scans).'
                        ' 0 = one full-length scan')
    p.add_argument('--protocol', default='scan', choices=['scan', 'calls'],
                   help='"scan" = one jitted lax.scan over all frames + one '
                        'readback (pure device throughput, the default); '
                        '"calls" = one jitted call + hard float() readback '
                        'per frame. Use "calls" for graphs whose scan form '
                        'faults the remote worker (legacy flat-sparse '
                        'encoders); its number is an UPPER bound on latency '
                        '(includes ~23 ms/call tunnel RTT + host dispatch).')
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
    from tpu_bev3d.testing import build_detector_from_cfg

    cfg = Config.fromfile(args.config)
    model = build_detector_from_cfg(cfg.model)
    streaming = cfg.model.get('type') == 'StreamPETR'

    host_batches = _bench_batches(cfg, args.iters, args.num_points,
                                  args.batch_size, args.points_dist)
    batches = [{k: jnp.asarray(v) for k, v in b.items()}
               for b in host_batches]
    variables = jax.jit(lambda r, b: model.init(r, b, mode='tensor'))(
        jax.random.PRNGKey(0), batches[0])

    def _acc(out):
        return sum(jnp.sum(jnp.abs(l).astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out)
                   if jnp.issubdtype(l.dtype, jnp.floating)) + 0.0

    # Scan-chained throughput: ONE jitted call runs every frame
    # back-to-back on device (lax.scan over stacked distinct batches)
    # and returns a single reduction that float() hard-reads back.
    # Rationale (docs/benchmarks.md): per-frame block_until_ready
    # returns early for some zoo graphs on the remote tunnel (reported
    # sub-ms FPS), and chaining per-output readbacks pays ~100 tiny
    # dispatches. One call + one readback = pure device throughput.
    if args.protocol == 'calls':
        # Per-frame fallback: one jitted call + one hard scalar readback
        # per frame. Pays the ~23 ms tunnel RTT + host dispatch per call,
        # so the fps is an UPPER bound on per-frame latency — but it does
        # not build the N-step scan graph that faults the remote worker
        # for the legacy flat-sparse encoders (docs/benchmarks.md known
        # issue).
        fwd = jax.jit(lambda v, b: _acc(model.apply(v, b, mode='predict')))
        for b in batches[:2]:                       # compile + warm
            _ = float(fwd(variables, b))
        t0 = time.perf_counter()
        for b in batches:
            _ = float(fwd(variables, b))
        dt = time.perf_counter() - t0
        fps = len(batches) * args.batch_size / dt
        print(f'{fps:.2f} frames/s ({dt / len(batches) * 1000:.2f} '
              f'ms/iter, {len(batches)} per-call sync incl. tunnel RTT)')
        return

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

    if streaming:
        # deployment-faithful streaming: memory propagates across frames
        _, mem0 = model.apply(variables, batches[0], mode='predict')
        mem0 = jax.tree_util.tree_map(jnp.zeros_like, mem0)

        @jax.jit
        def run_all(v, bs, m0):
            def body(carry, b):
                acc, mem = carry
                out, mem = model.apply(v, b, memory=mem, mode='predict')
                return (acc + _acc(out), mem), 0
            (acc, _), _ = jax.lax.scan(body, (jnp.float32(0), m0), bs)
            return acc

        run = lambda v, bs: run_all(v, bs, mem0)
    else:
        @jax.jit
        def run_all(v, bs):
            def body(carry, b):
                out = model.apply(v, b, mode='predict')
                return carry + _acc(out), 0
            acc, _ = jax.lax.scan(body, jnp.float32(0), bs)
            return acc

        run = run_all

    chunk = args.scan_chunk or args.iters
    n_used = (args.iters // chunk) * chunk
    if n_used != args.iters:
        print(f'[scan-chunk] using {n_used} of {args.iters} frames '
              f'({args.iters // chunk} chunks of {chunk})')
    chunks = [jax.tree_util.tree_map(lambda x: x[i:i + chunk], stacked)
              for i in range(0, n_used, chunk)]

    def run_chunks(v, cs):
        # each chunk is one jitted scan; the device runs them
        # back-to-back (enqueue-only loop), ONE float() at the end
        return sum(run(v, c) for c in cs)

    # warmup/compile on a perturbed copy (the tunnel memoizes repeated
    # identical calls)
    warm = [jax.tree_util.tree_map(
        lambda x: x + jnp.asarray(0.001, x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, chunks[0])]
    _ = float(run_chunks(variables, warm))
    t0 = time.perf_counter()
    _ = float(run_chunks(variables, chunks))
    dt = time.perf_counter() - t0
    fps = n_used * args.batch_size / dt
    proto = 'streaming (memory-propagated) scan' if streaming \
        else 'frames scan-chained'
    ck = f' in {len(chunks)}x{chunk}-step chunks' if args.scan_chunk else ''
    print(f'{fps:.2f} frames/s ({dt / n_used * 1000:.2f} ms/iter, '
          f'{n_used} {proto}{ck}, one readback)')


if __name__ == '__main__':
    main()
