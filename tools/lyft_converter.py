"""Lyft Level-5 → info-pkl converter.

Ref: tools/dataset_converters/lyft_converter.py — the Lyft dataset ships
nuScenes-schema JSON tables (sample, sample_data, sample_annotation,
calibrated_sensor, ego_pose, instance, category), so the devkit-free
nuScenes table walker is reused with the Lyft class list and no
velocity/attribute fields.

Usage: python tools/lyft_converter.py --root data/lyft --version
v1.01-train --out data/lyft/lyft_infos_train.pkl
"""
from __future__ import annotations

import argparse

from nuscenes_converter import create_nuscenes_infos  # same table schema

LYFT_CLASSES = ('car', 'truck', 'bus', 'emergency_vehicle',
                'other_vehicle', 'motorcycle', 'bicycle', 'pedestrian',
                'animal')


def create_lyft_infos(root, version='v1.01-train', out_file=None,
                      max_sweeps=10):
    return create_nuscenes_infos(root, version=version, out_file=out_file,
                                 max_sweeps=max_sweeps,
                                 classes=LYFT_CLASSES,
                                 with_velocity=False)


def main():  # pragma: no cover - CLI wrapper
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--version', default='v1.01-train')
    ap.add_argument('--out', default=None)
    ap.add_argument('--max-sweeps', type=int, default=10)
    args = ap.parse_args()
    infos = create_lyft_infos(args.root, args.version, args.out,
                              args.max_sweeps)
    print(f'wrote {len(infos)} lyft infos')


if __name__ == '__main__':
    main()
