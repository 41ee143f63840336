#!/usr/bin/env python
"""Evaluation CLI (ref: tools/test.py — build runner, run test loop +
metric)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def parse_args():
    p = argparse.ArgumentParser(description='Evaluate a 3D detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--work-dir', default=None)
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def _honor_platform_env():
    # this environment's sitecustomize force-sets JAX_PLATFORMS=axon at
    # interpreter start, so the env var alone cannot select a platform;
    # jax.config.update after import can (see tests/conftest.py)
    want = os.environ.get('TPU_BEV3D_PLATFORM')
    if want:
        import jax
        jax.config.update('jax_platforms', want)


def main():
    _honor_platform_env()
    args = parse_args()
    from tpu_bev3d.config import Config
    from tpu_bev3d.engine.runner import Runner

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(args.cfg_options)
    work_dir = args.work_dir or os.path.join(
        'work_dirs', os.path.splitext(os.path.basename(args.config))[0])
    runner = Runner(cfg, work_dir=work_dir)
    runner.test()


if __name__ == '__main__':
    main()
