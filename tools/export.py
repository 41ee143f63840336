#!/usr/bin/env python
"""Export a config's inference graph to a StableHLO artifact
(ref: projects/BEVFusion/deploy/export.py ONNX path).

Usage: python tools/export.py CONFIG OUT.stablehlo [--num-points N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('out')
    p.add_argument('--num-points', type=int, default=30000)
    p.add_argument('--checkpoint', default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_bev3d.config import Config
    from tpu_bev3d.deploy import export_model
    from tpu_bev3d.testing import (build_detector_from_cfg,
                                   create_detector_inputs)

    cfg = Config.fromfile(args.config)
    model = build_detector_from_cfg(cfg.model)
    ve = cfg.model.get('voxel_encoder', {}) or {}
    pdim = int(ve.get('in_channels', ve.get('num_features', 4)))
    batch = create_detector_inputs(
        batch_size=1, num_points=args.num_points, point_dim=pdim,
        pc_range=tuple(cfg.model.point_cloud_range))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = jax.jit(lambda r, b: model.init(r, b, mode='tensor'))(
        jax.random.PRNGKey(0), batch)
    if args.checkpoint:
        from tpu_bev3d.apis.inference import init_model
        variables = init_model(cfg, args.checkpoint).variables
    out = export_model(model, variables, batch, args.out)
    print(f'exported → {out} ({os.path.getsize(out) / 1e6:.1f} MB)')


if __name__ == '__main__':
    main()
