#!/usr/bin/env python
"""Turnkey reference-checkpoint parity run (VERDICT r4 item 3).

One command between "the data + a reference ``.pth`` arrived" and "the
NDS/mAP delta table": convert the torch checkpoint through
utils/mappings.py, run the (mesh-sharded) eval loop over the configured
test split, and print ours-vs-reference deltas with a pass/fail exit
code.

    python tools/parity_run.py CONFIG CHECKPOINT.pth \
        --data-root data/nuscenes [--ann-file nuscenes_infos_val.pkl] \
        [--expected NDS=0.6461 mAP=0.5611] [--tol 0.003] \
        [--work-dir work_dirs/parity] [--cfg-options k=v ...]

``--expected`` defaults from the built-in table of published reference
numbers (BASELINE.md sources) when the config basename matches; pass
explicit pairs to override. Exit code is 1 when any |delta| exceeds
``--tol`` (default 0.003 = the 0.3-point parity bar).

Wall-time expectation (single v5e chip, compile cache warm): nuScenes
val = 6019 frames; at the measured faithful-serving 10.4 fps the model
forward alone is ~10 min, plus one cold compile (~20 min on a fresh
machine) and the metric pass (~2 min) — budget ~15 min warm / ~35 min
cold. KITTI val (3769 frames) at SECOND-tile 39.7 fps: ~3 min warm.

Ref: mmdet3d/evaluation/metrics/nuscenes_metric.py:125,149 (the metric
being matched), tools/test.py (the reference eval entry).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

# published reference-zoo numbers, keyed by our config basename
# (sources: BASELINE.md table / reference configs/*/README.md)
REF_EXPECTED = {
    'pointpillars_kitti_3class': {'mAP': 0.6407},
    'second_kitti_3class': {'mAP': 0.653},
    'second_tile_kitti_3class': {'mAP': 0.653},
    'centerpoint_voxel01_second_secfpn_nus': {'mAP': 0.5611,
                                              'NDS': 0.6461},
    'bevfusion_lidar_cam_voxel0075_second_secfpn_nus': {'mAP': 0.6952,
                                                        'NDS': 0.7212},
    'bevfusion_lidar_cam_voxel0075_second_secfpn_staticpool_nus':
        {'mAP': 0.6952, 'NDS': 0.7212},
}


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('config')
    p.add_argument('checkpoint', help='reference torch .pth state dict')
    p.add_argument('--data-root', default=None,
                   help='override test_dataloader.dataset.data_root')
    p.add_argument('--ann-file', default=None,
                   help='override test_dataloader.dataset.ann_file')
    p.add_argument('--work-dir', default='work_dirs/parity')
    p.add_argument('--expected', nargs='*', default=None,
                   metavar='NAME=VAL',
                   help='reference numbers to diff against (fractions, '
                        'e.g. NDS=0.6461); default: built-in table')
    p.add_argument('--tol', type=float, default=0.003,
                   help='parity bar on |delta| (default 0.3 points)')
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    want = os.environ.get('TPU_BEV3D_PLATFORM')
    if want:
        import jax
        jax.config.update('jax_platforms', want)
    import jax
    import jax.numpy as jnp
    import optax

    from tpu_bev3d.apis.inference import _make_init_batch
    from tpu_bev3d.config import Config
    from tpu_bev3d.engine.runner import Runner
    from tpu_bev3d.engine.train_state import TrainState
    from tpu_bev3d.registry import MODELS
    from tpu_bev3d.utils.mappings import mapping_for_model
    from tpu_bev3d.utils.torch_convert import (convert_torch_checkpoint,
                                               load_torch_state_dict)
    import tpu_bev3d.models  # noqa: F401  (registry)

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(args.cfg_options)
    ds = cfg.test_dataloader.dataset
    if args.data_root:
        ds.data_root = args.data_root
    if args.ann_file:
        ds.ann_file = args.ann_file

    # ---- 1. convert the torch checkpoint in-process -------------------
    print(f'[parity] converting {args.checkpoint} ...', flush=True)
    model = MODELS.build(dict(cfg.model))
    batch = {k: jnp.asarray(v) for k, v in _make_init_batch(cfg).items()}
    variables = jax.jit(
        lambda r, b: model.init(r, b, mode='tensor'))(
            jax.random.PRNGKey(0), batch)
    sd = load_torch_state_dict(args.checkpoint)
    out = convert_torch_checkpoint(sd, variables,
                                   mapping_for_model(dict(cfg.model)),
                                   verbose=False)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=out['params'],
                       batch_stats=out.get('batch_stats', {}),
                       opt_state=optax.sgd(0.0).init(out['params']))

    # ---- 2. sharded eval over the test split --------------------------
    print('[parity] running eval ...', flush=True)
    runner = Runner(cfg, work_dir=args.work_dir)
    metrics = {k: float(v) for k, v in runner.test(state=state).items()}

    # ---- 3. delta table ------------------------------------------------
    key = os.path.splitext(os.path.basename(args.config))[0]
    expected = dict(REF_EXPECTED.get(key, {}))
    if args.expected:
        expected = {}
        for kv in args.expected:
            k, _, v = kv.partition('=')
            expected[k] = float(v)

    rows, worst = [], 0.0
    for name, ref in sorted(expected.items()):
        ours = metrics.get(name)
        if ours is None:
            rows.append((name, 'MISSING', f'{ref:.4f}', '—'))
            worst = float('inf')
            continue
        d = ours - ref
        worst = max(worst, abs(d))
        rows.append((name, f'{ours:.4f}', f'{ref:.4f}', f'{d:+.4f}'))
    print(f'\n{"metric":<16}{"ours":>10}{"reference":>12}{"delta":>10}')
    for r in rows:
        print(f'{r[0]:<16}{r[1]:>10}{r[2]:>12}{r[3]:>10}')
    if not expected:
        print('(no expected values known for this config — pass '
              '--expected NAME=VAL to diff)')
    print(json.dumps(dict(config=key, metrics=metrics,
                          expected=expected, tol=args.tol,
                          parity=bool(expected) and worst <= args.tol)))
    if expected and worst > args.tol:
        print(f'[parity] FAIL: worst |delta| {worst:.4f} > tol {args.tol}')
        sys.exit(1)
    if expected:
        print(f'[parity] PASS: worst |delta| {worst:.4f} <= {args.tol}')


if __name__ == '__main__':
    main()
