"""Benchmark: BEVFusion L+C (nuScenes geometry) inference frames/sec/chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol mirrors the reference's FPS benchmark (ref: tools/analysis_tools/
benchmark.py:35-82 — warmup then timed pure-inference iterations).
vs_baseline: the reference publishes no BEVFusion FPS (BASELINE.md —
"Inf time (fps)" columns empty); the public BEVFusion paper reports
~8.4 fps on an A100 for the fused L+C model, used here as the anchor until
a reference checkpoint run pins it.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 8.4  # BEVFusion L+C A100 (paper anchor), see docstring


def main():
    import jax
    # persistent compile cache: the remote-TPU compile of the full fused
    # graph takes ~20 min cold; cached runs start in seconds
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    from __graft_entry__ import entry

    fn, (variables, batch) = entry()
    jfn = jax.jit(fn)

    # distinct pre-uploaded batches (device_put from host — lazily computed
    # device inputs have produced bogus timings through the tunnel; identical
    # repeated args get memoized by the tunnel, so EVERY iteration gets its
    # own input)
    import numpy as np
    n_iter = 12
    host_pts = np.asarray(batch['points'])
    batches = [batch]
    for i in range(1, n_iter):
        b = dict(batch)
        b['points'] = jax.device_put(host_pts + np.float32(0.001 * i))
        batches.append(b)

    # warmup / compile + first-use of every input buffer
    for b in batches:
        jax.block_until_ready(jfn(variables, b))

    # throughput protocol: enqueue all frames, then block on each output in
    # submission order. The device executes back-to-back; the ~23 ms
    # host<->device RTT of this remote-TPU tunnel is paid once instead of
    # per frame (the reference's per-iter torch.cuda.synchronize costs
    # microseconds on a local GPU — paying a remote tunnel round trip per
    # frame would measure the tunnel, not the chip).
    #
    # The protocol itself is repeated: a single shot is fragile on a
    # 1-CPU host (BENCH_r02 run 2 recorded 26.65 fps, 17% below the idle
    # band, from background noise alone). Median of n_rep runs + spread
    # in the JSON so one poisoned run can't become the round's number.
    bsz = batch['points'].shape[0]
    n_rep = 5
    fps_runs = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        outs = [jfn(variables, batches[i]) for i in range(n_iter)]
        for o in outs:
            jax.block_until_ready(o)
        dt = time.perf_counter() - t0
        fps_runs.append(n_iter * bsz / dt)
    fps_runs.sort()
    fps = fps_runs[n_rep // 2]
    spread = (fps_runs[-1] - fps_runs[0]) / fps
    if spread > 0.15:
        print(f'# WARN: run spread {spread:.1%} exceeds the 15% idle '
              f'band — host contention suspected; runs: '
              f'{[round(f, 1) for f in fps_runs]}', file=sys.stderr)
    print(json.dumps({
        'metric': 'bevfusion_lc_inference_fps_per_chip',
        'value': round(fps, 3),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
        'runs': [round(f, 2) for f in fps_runs],
        'spread_pct': round(100 * spread, 1),
    }))


if __name__ == '__main__':
    main()
