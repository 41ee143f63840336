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

    import numpy as np
    import jax.numpy as jnp
    # frames per scan: amortizes the one ~23 ms tunnel RTT per timed call
    # toward pure device throughput (tools/benchmark.py uses 50; 12 vs 24
    # measured 31.18 vs 32.30 fps — ~1 ms/frame of residual RTT at 12).
    # A/B via TPU_BEV3D_BENCH_FRAMES.
    n_iter = int(os.environ.get('TPU_BEV3D_BENCH_FRAMES', 24))
    n_rep = 5
    bsz = batch['points'].shape[0]

    # Scan-chained throughput (same instrument as tools/benchmark.py,
    # see docs/benchmarks.md): ONE jitted call runs all n_iter frames
    # back-to-back in a lax.scan and returns a single reduction that is
    # hard-read back. The per-call alternative (enqueue 12 calls, block
    # once) additionally measures the 1-CPU host's dispatch path through
    # the remote tunnel: a lidar-only flagship with ~9 ms of device work
    # read 31.8 ms/frame under it — dispatch-bound, not device-bound. A
    # local chip's host would not have that overhead; the scan protocol
    # measures the chip. Set TPU_BEV3D_BENCH_PROTOCOL=calls for the old
    # per-call protocol.
    #
    # Every rep×frame gets DISTINCT points (the tunnel memoizes repeated
    # identical whole-call args, and identical per-frame inputs are not
    # representative).
    host_pts = np.asarray(batch['points'])

    def stacked_for_rep(r):
        pts = np.stack([host_pts[0] + np.float32(0.001 * (r * n_iter + i))
                        for i in range(n_iter)])[:, None]
        leaves = {k: jnp.stack([v] * n_iter) for k, v in batch.items()
                  if k != 'points'}
        leaves['points'] = jax.device_put(pts)
        return leaves

    @jax.jit
    def run_all(v, bs):
        def body(carry, b):
            out = fn(v, b)
            acc = sum(jnp.sum(jnp.abs(l).astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating))
            return carry + acc, 0
        acc, _ = jax.lax.scan(body, jnp.float32(0), bs)
        return acc

    if os.environ.get('TPU_BEV3D_BENCH_PROTOCOL') == 'calls':
        jfn = jax.jit(fn)
        batches = [batch]
        for i in range(1, n_iter):
            b = dict(batch)
            b['points'] = jax.device_put(host_pts + np.float32(0.001 * i))
            batches.append(b)
        for b in batches:
            jax.block_until_ready(jfn(variables, b))
        fps_runs = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            outs = [jfn(variables, batches[i]) for i in range(n_iter)]
            for o in outs:
                jax.block_until_ready(o)
            fps_runs.append(n_iter * bsz / (time.perf_counter() - t0))
        fps_runs.sort()
    else:
        reps = [stacked_for_rep(r) for r in range(n_rep + 1)]
        _ = float(run_all(variables, reps[0]))     # compile + warm
        # The protocol is repeated: a single shot is fragile on a 1-CPU
        # host (BENCH_r02 run 2 recorded 26.65 fps from background noise
        # alone). Median of n_rep runs + spread in the JSON.
        fps_runs = []
        for r in range(1, n_rep + 1):
            t0 = time.perf_counter()
            _ = float(run_all(variables, reps[r]))
            fps_runs.append(n_iter * bsz / (time.perf_counter() - t0))
        fps_runs.sort()
    fps = fps_runs[n_rep // 2]
    spread = (fps_runs[-1] - fps_runs[0]) / fps
    if spread > 0.15:
        print(f'# WARN: run spread {spread:.1%} exceeds the 15% idle '
              f'band — host contention suspected; runs: '
              f'{[round(f, 1) for f in fps_runs]}', file=sys.stderr)

    # ---- MFU (VERDICT r3 item 2): per-frame model FLOPs from XLA HLO
    # cost analysis (client-side, no TPU compile: lower for the CPU
    # backend inside this process — the axon plugin returns None from
    # Lowered.cost_analysis), achieved TFLOP/s = flops×fps, and % of the
    # chip's bf16 MXU peak (v5e = 197 TFLOP/s bf16).
    gflops = tflops = mfu = None
    try:
        peak = float(os.environ.get('TPU_BEV3D_PEAK_TFLOPS', 197.0))
        # trace grid cumsums as log-depth scans for honest counting
        # (see ops/tile_sparse.py _grid_cumsum)
        os.environ['TPU_BEV3D_CUMSUM_IMPL'] = 'assoc'
        try:
            with jax.default_device(jax.devices('cpu')[0]):
                shapes = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                    variables)
                ca = jax.jit(fn).lower(shapes, batch).cost_analysis()
        finally:
            os.environ.pop('TPU_BEV3D_CUMSUM_IMPL', None)
        ca = ca[0] if isinstance(ca, list) else ca
        gflops = float(ca.get('flops', 0)) / 1e9 / bsz
        tflops = gflops * fps / 1e3
        mfu = 100.0 * tflops / peak
    except Exception as e:                       # pragma: no cover
        print(f'# WARN: cost analysis unavailable: {e}', file=sys.stderr)
    print(json.dumps({
        'metric': 'bevfusion_lc_inference_fps_per_chip',
        'value': round(fps, 3),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
        'runs': [round(f, 2) for f in fps_runs],
        'spread_pct': round(100 * spread, 1),
        'model_gflops_per_frame': round(gflops, 2) if gflops else None,
        'achieved_tflops': round(tflops, 3) if tflops else None,
        'mfu_pct_bf16_peak': round(mfu, 2) if mfu else None,
    }))


if __name__ == '__main__':
    main()
