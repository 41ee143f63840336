#!/usr/bin/env python
"""Save (or compare) flagship predictions on the real demo frame.

Used for output-level A/Bs of config knobs that are toggled by env vars
read at config-build time (e.g. TPU_BEV3D_TOPK_APPROX): run once per
setting to save an npz, then compare.

  python tools/probe_topk_compare.py save /tmp/exact.npz
  TPU_BEV3D_TOPK_APPROX=1 python tools/probe_topk_compare.py save /tmp/approx.npz
  python tools/probe_topk_compare.py diff /tmp/exact.npz /tmp/approx.npz

Weights are deterministic (PRNGKey(0) init via entry()), so the two runs
share parameters and any output difference is the knob's effect.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save(path):
    import jax
    from __graft_entry__ import entry
    fn, (variables, batch) = entry()
    out = jax.jit(fn)(variables, batch)
    np.savez(path, bboxes=np.asarray(out['bboxes'][0]),
             scores=np.asarray(out['scores'][0]),
             labels=np.asarray(out['labels'][0]))
    print(f'saved {path}')


def diff(a_path, b_path):
    a, b = np.load(a_path), np.load(b_path)
    sa, sb = a['scores'], b['scores']
    # compare on the union of confident slots
    keep = (sa > 0.1) | (sb > 0.1)
    d_ctr = np.abs(a['bboxes'][keep][:, :3] - b['bboxes'][keep][:, :3])
    d_sc = np.abs(sa[keep] - sb[keep])
    lab_eq = (a['labels'][keep] == b['labels'][keep]).mean() if keep.any() \
        else 1.0
    print(f'slots compared: {int(keep.sum())} / {len(sa)}')
    print(f'center |d| max {d_ctr.max() if keep.any() else 0:.4f} m, '
          f'mean {d_ctr.mean() if keep.any() else 0:.4f} m')
    print(f'score |d| max {d_sc.max() if keep.any() else 0:.4f}, '
          f'mean {d_sc.mean() if keep.any() else 0:.4f}')
    print(f'label agreement {lab_eq:.3f}')


if __name__ == '__main__':
    if sys.argv[1] == 'save':
        save(sys.argv[2])
    else:
        diff(sys.argv[2], sys.argv[3])
