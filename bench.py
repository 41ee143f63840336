"""Benchmark: flagship-model inference frames/sec/chip on the local device.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol mirrors the reference's FPS benchmark (ref: tools/analysis_tools/
benchmark.py:35-82 — warmup then timed pure-inference iterations).
vs_baseline: no BEVFusion GPU number is published in the reference repo
(BASELINE.md), so we report against the 8xV100 SECOND train-throughput-derived
inference anchor of ~20 fps/GPU until a reference checkpoint run pins it.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 20.0  # provisional anchor, see module docstring


def main():
    import jax
    from __graft_entry__ import entry

    fn, (variables, batch) = entry()
    jfn = jax.jit(fn)

    # warmup / compile
    out = jfn(variables, batch)
    jax.block_until_ready(out)

    n_warm, n_iter = 5, 20
    for _ in range(n_warm):
        jax.block_until_ready(jfn(variables, batch))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        jax.block_until_ready(jfn(variables, batch))
    dt = time.perf_counter() - t0
    bsz = batch['points'].shape[0]
    fps = n_iter * bsz / dt
    print(json.dumps({
        'metric': 'flagship_inference_fps_per_chip',
        'value': round(fps, 3),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
    }))


if __name__ == '__main__':
    main()
