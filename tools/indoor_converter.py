"""ScanNet / SUN RGB-D → info-pkl converter.

Ref: tools/dataset_converters/indoor_converter.py (+ scannet_data_utils /
sunrgbd_data_utils) — both datasets are consumed from the standard
pre-extracted per-scene numpy layout (the same one the reference's
extraction scripts under data/scannet and data/sunrgbd produce):

  <root>/points/<scene>.bin (or .npy)          xyz(+rgb) float32
  <root>/instance_mask/<scene>.bin             per-point instance ids
  <root>/semantic_mask/<scene>.bin             per-point semantic ids
  <root>/<split>_bboxes/<scene>.npy            [N, 7(+1 cls)] boxes

Usage: python tools/indoor_converter.py --root data/scannet --dataset
scannet --split train
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

SCANNET_CLASSES = (
    'cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
    'bookshelf', 'picture', 'counter', 'desk', 'curtain', 'refrigerator',
    'showercurtrain', 'toilet', 'sink', 'bathtub', 'garbagebin')
SUNRGBD_CLASSES = (
    'bed', 'table', 'sofa', 'chair', 'toilet', 'desk', 'dresser',
    'night_stand', 'bookshelf', 'bathtub')


def build_indoor_infos(root, dataset='scannet', split='train',
                       out_file=None):
    classes = SCANNET_CLASSES if dataset == 'scannet' else SUNRGBD_CLASSES
    pts_dir = os.path.join(root, 'points')
    box_dir = os.path.join(root, f'{split}_bboxes')
    scenes = sorted(os.path.splitext(f)[0] for f in os.listdir(box_dir))
    data_list = []
    for sc in scenes:
        boxes = np.load(os.path.join(box_dir, sc + '.npy'))
        instances = []
        for row in boxes:
            # layout: x, y, z(center), dx, dy, dz[, yaw][, class]
            has_yaw = boxes.shape[1] in (8,) or dataset == 'sunrgbd'
            b = row[:7] if has_yaw else np.concatenate([row[:6], [0.0]])
            cls = int(row[-1])
            # stored z is the gravity center; our boxes are bottom-center
            b = b.copy()
            b[2] -= b[5] / 2
            instances.append(dict(bbox_3d=[float(v) for v in b],
                                  bbox_label_3d=cls))
        pbin = os.path.join('points', sc + '.bin')
        if not os.path.exists(os.path.join(root, pbin)):
            pbin = os.path.join('points', sc + '.npy')
        info = dict(sample_idx=sc,
                    lidar_points=dict(lidar_path=pbin, num_pts_feats=6),
                    instances=instances)
        for sub in ('instance_mask', 'semantic_mask'):
            p = os.path.join(sub, sc + '.bin')
            if os.path.exists(os.path.join(root, p)):
                info[f'pts_{sub}_path'] = p
        data_list.append(info)
    out = dict(metainfo=dict(dataset=dataset, classes=list(classes)),
               data_list=data_list)
    out_file = out_file or os.path.join(
        root, f'{dataset}_infos_{split}.pkl')
    with open(out_file, 'wb') as f:
        pickle.dump(out, f)
    return data_list, out_file


def main():  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--dataset', default='scannet',
                    choices=['scannet', 'sunrgbd'])
    ap.add_argument('--split', default='train')
    ap.add_argument('--out', default=None)
    a = ap.parse_args()
    infos, out = build_indoor_infos(a.root, a.dataset, a.split, a.out)
    print(f'wrote {len(infos)} infos -> {out}')


if __name__ == '__main__':
    main()
