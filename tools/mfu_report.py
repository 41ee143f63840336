#!/usr/bin/env python
"""MFU ledger: per-frame model FLOPs (XLA HLO cost analysis), achieved
TFLOP/s and %-of-peak for a config at a measured fps (VERDICT r3 item 2).

FLOPs come from client-side cost analysis of the CPU-lowered predict
graph (no TPU compile needed; backend-independent HLO flop counting —
same instrument as bench.py's JSON fields). Peak defaults to the v5e
bf16 MXU peak, 197 TFLOP/s.

Usage:
    python tools/mfu_report.py CONFIG --fps 37.3 [--num-points 30000]
    python tools/mfu_report.py CONFIG            # FLOPs only
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def model_gflops(config, num_points=30000):
    """Per-frame predict-graph GFLOPs for a config (batch 1)."""
    if os.environ.get('TPU_BEV3D_PLATFORM') == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp
    from tpu_bev3d.apis.inference import _make_init_batch
    from tpu_bev3d.config import Config
    from tpu_bev3d.registry import MODELS
    import tpu_bev3d.models  # noqa: F401

    cfg = Config.fromfile(config) if isinstance(config, str) else config
    model = MODELS.build(dict(cfg.model))
    batch = _make_init_batch(cfg)
    if 'points' in batch and num_points:
        import numpy as np
        pts = batch['points']
        reps = -(-num_points // pts.shape[1])
        batch['points'] = np.tile(pts, (1, reps, 1))[:, :num_points]
        batch['points_mask'] = np.ones(batch['points'].shape[:2], bool)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    shapes = jax.eval_shape(
        lambda r, b: model.init(r, b, mode='tensor'),
        jax.random.PRNGKey(0), batch)
    shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), shapes)
    fn = jax.jit(lambda v, b: model.apply(v, b, mode='predict'))
    # honest flop counting: trace grid cumsums as log-depth scans (the
    # production reduce_window form counts O(n²) phantom flops — see
    # ops/tile_sparse.py _grid_cumsum)
    os.environ['TPU_BEV3D_CUMSUM_IMPL'] = 'assoc'
    try:
        with jax.default_device(jax.devices('cpu')[0]):
            ca = fn.lower(shapes, batch).cost_analysis()
    finally:
        os.environ.pop('TPU_BEV3D_CUMSUM_IMPL', None)
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get('flops', 0)) / 1e9, \
        float(ca.get('bytes accessed', 0)) / 1e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--fps', type=float, default=None,
                   help='measured frames/sec/chip (tools/benchmark.py '
                        'or bench.py)')
    p.add_argument('--num-points', type=int, default=30000)
    p.add_argument('--peak-tflops', type=float,
                   default=float(os.environ.get('TPU_BEV3D_PEAK_TFLOPS',
                                                197.0)))
    args = p.parse_args()
    gflops, gbytes = model_gflops(args.config, args.num_points)
    out = {'config': os.path.basename(args.config),
           'model_gflops_per_frame': round(gflops, 2),
           'bytes_accessed_gb': round(gbytes, 2),
           'arith_intensity_flop_per_byte': round(gflops / max(gbytes, 1e-9),
                                                  2)}
    if args.fps:
        tflops = gflops * args.fps / 1e3
        out.update(fps=args.fps,
                   achieved_tflops=round(tflops, 3),
                   mfu_pct_bf16_peak=round(100 * tflops / args.peak_tflops,
                                           2))
    print(json.dumps(out))


if __name__ == '__main__':
    main()
