#!/usr/bin/env python
"""Repair the one known-truncated Lyft v1.01 lidar sweep.

Ref: tools/dataset_converters/lyft_data_fixer.py — the published Lyft
train split ships ``host-a011_lidar1_1233090652702363606.bin`` with its
final 5-float point record cut short by two values (see the Kaggle
discussion linked there); every loader that reshapes to [-1, 5] dies on
it. The fix pads the file with a plausible (intensity=100, ring=1) tail
so the record count is whole. Idempotent: already-whole files are left
untouched.
"""
import argparse
import os

import numpy as np

POINT_DIM = 5
BROKEN_SWEEP = 'lidar/host-a011_lidar1_1233090652702363606.bin'
PAD_VALUES = (100.0, 1.0)


def fix_lyft(root_folder: str = './data/lyft',
             version: str = 'v1.01') -> bool:
    """Returns True if the file needed (and received) the fix."""
    path = os.path.join(root_folder, f'{version}-train', BROKEN_SWEEP)
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f'{path} missing — download the full Lyft {version} train set '
            'first')
    pts = np.fromfile(path, dtype=np.float32)
    rem = pts.size % POINT_DIM
    if rem == 0:
        print(f'{path}: already {pts.size // POINT_DIM} whole records — '
              'no fix needed')
        return False
    need = POINT_DIM - rem
    pad = np.asarray(PAD_VALUES[-need:], np.float32)
    np.concatenate([pts, pad]).tofile(path)
    print(f'{path}: padded {need} trailing value(s) '
          f'{pad.tolist()} — now {(pts.size + need) // POINT_DIM} records')
    return True


if __name__ == '__main__':
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--root-folder', default='./data/lyft')
    ap.add_argument('--version', default='v1.01')
    a = ap.parse_args()
    fix_lyft(a.root_folder, a.version)
