#!/usr/bin/env python
"""FLOP / memory-traffic report for a config's inference graph
(ref: tools/analysis_tools/get_flops.py) via XLA cost analysis."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--num-points', type=int, default=30000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_bev3d.config import Config
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
    fn = jax.jit(lambda v, b: model.apply(v, b, mode='predict'))
    comp = fn.lower(variables, batch).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables['params']))
    print(f'params:         {n_params / 1e6:.2f} M')
    print(f'flops:          {ca.get("flops", 0) / 1e9:.2f} GFLOP')
    print(f'bytes accessed: {ca.get("bytes accessed", 0) / 1e9:.2f} GB')


if __name__ == '__main__':
    main()
