#!/usr/bin/env python
"""Offline data preparation (ref: tools/create_data.py:18-120 — per-dataset
info-pkl creation → GT-database creation).

Supported here:
  kitti  — raw KITTI (velodyne/label_2/calib) → infos pkl + GT database
  custom — generic directory of .bin point clouds + a JSON/pkl annotation
           list (the custom-scene path of the reference,
           tools/dataset_converters/custom_scene_converter.py:14)
  gtdb   — build a GT database from an existing infos pkl
           (ref tools/dataset_converters/create_gt_database.py:111)
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def _kitti_calib(path):
    out = {}
    with open(path) as f:
        for line in f:
            if ':' not in line:
                continue
            k, v = line.split(':', 1)
            out[k.strip()] = np.asarray(
                [float(x) for x in v.split()], np.float32)
    return out


def create_kitti_infos(root, split='training', out_file=None):
    """KITTI label_2 camera-frame boxes → LiDAR-frame 7-DoF instances."""
    vel_dir = os.path.join(root, split, 'velodyne')
    lab_dir = os.path.join(root, split, 'label_2')
    cal_dir = os.path.join(root, split, 'calib')
    ids = sorted(os.path.splitext(f)[0] for f in os.listdir(vel_dir)
                 if f.endswith('.bin'))
    data_list = []
    for sid in ids:
        info = dict(sample_idx=sid, lidar_points=dict(
            lidar_path=os.path.join(split, 'velodyne', f'{sid}.bin'),
            num_pts_feats=4))
        lab = os.path.join(lab_dir, f'{sid}.txt')
        cal = os.path.join(cal_dir, f'{sid}.txt')
        if os.path.exists(lab) and os.path.exists(cal):
            calib = _kitti_calib(cal)
            Tr = np.eye(4, dtype=np.float32)
            Tr[:3] = calib['Tr_velo_to_cam'].reshape(3, 4)
            R0 = np.eye(4, dtype=np.float32)
            R0[:3, :3] = calib['R0_rect'].reshape(3, 3)
            cam2lidar = np.linalg.inv(R0 @ Tr)
            instances = []
            with open(lab) as f:
                for line in f:
                    p = line.split()
                    name = p[0]
                    if name == 'DontCare':
                        continue
                    h, w, l = float(p[8]), float(p[9]), float(p[10])
                    xyz_cam = np.asarray([float(p[11]), float(p[12]),
                                          float(p[13]), 1.0], np.float32)
                    ry = float(p[14])
                    xyz = (cam2lidar @ xyz_cam)[:3]
                    yaw = -ry - np.pi / 2
                    instances.append(dict(
                        bbox_3d=[float(xyz[0]), float(xyz[1]),
                                 float(xyz[2]), l, w, h, float(yaw)],
                        bbox_label_3d=name,
                        num_lidar_pts=-1))
            info['instances'] = instances
            info['calib'] = {k: v.tolist() for k, v in calib.items()}
        data_list.append(info)
    out_file = out_file or os.path.join(root, f'kitti_infos_{split}.pkl')
    with open(out_file, 'wb') as f:
        pickle.dump(dict(metainfo=dict(dataset='kitti'),
                         data_list=data_list), f)
    print(f'wrote {len(data_list)} infos → {out_file}')
    return out_file


def create_gt_database(root, info_file, classes, out_dir=None,
                       num_feats=4, z_origin='auto'):
    """Crop per-GT points → <cls>_gt bin files + dbinfos pkl
    (ref create_gt_database.py:111 — points_in_rbbox crops).

    ``z_origin``: 'bottom' (KITTI-schema pkls), 'gravity'
    (nuScenes/Lyft-schema pkls, which store the devkit box center), or
    'auto' — sniff from the pkl metainfo (nuScenes/Lyft converters write a
    ``version`` field). The emitted dbinfos ``box3d_lidar`` is always
    bottom-centered, matching what the dbsampler pastes at train time.
    """
    from tpu_bev3d.structures.boxes3d import points_in_rbbox
    out_dir = out_dir or os.path.join(root, 'gt_database')
    os.makedirs(out_dir, exist_ok=True)
    with open(info_file, 'rb') as f:
        pkl = pickle.load(f)
    infos = pkl['data_list']
    if z_origin == 'auto':
        z_origin = 'gravity' if str(
            pkl.get('metainfo', {}).get('version', '')
        ).startswith('v1.0') else 'bottom'
    db = {c: [] for c in classes}
    total = 0
    for info in infos:
        lp = info['lidar_points']['lidar_path']
        full = os.path.join(root, lp) if not os.path.isabs(lp) else lp
        pts = np.fromfile(full, np.float32).reshape(-1, num_feats)
        instances = info.get('instances', [])
        if not instances:
            continue
        boxes = np.asarray([i['bbox_3d'] for i in instances], np.float32)
        if z_origin == 'gravity':
            boxes = boxes.copy()
            boxes[:, 2] -= boxes[:, 5] * 0.5
        inside = points_in_rbbox(pts[:, :3], boxes)
        for gi, inst in enumerate(instances):
            name = inst['bbox_label_3d']
            name = classes[name] if isinstance(name, int) and \
                0 <= name < len(classes) else name
            if name not in db:
                continue
            gp = pts[inside[:, gi]].copy()
            gp[:, :3] -= boxes[gi, :3]          # box-relative (ref :334)
            rel = f'{info["sample_idx"]}_{name}_{gi}.bin'
            gp.tofile(os.path.join(out_dir, rel))
            db[name].append(dict(
                name=name, path=os.path.join(
                    os.path.basename(out_dir), rel),
                box3d_lidar=boxes[gi], num_points_in_gt=len(gp),
                difficulty=0, num_features=num_feats))
            total += 1
    out_pkl = os.path.join(root, 'dbinfos_train.pkl')
    with open(out_pkl, 'wb') as f:
        pickle.dump(db, f)
    print(f'wrote {total} GT crops → {out_dir}, dbinfos → {out_pkl}')
    return out_pkl


def main():
    p = argparse.ArgumentParser()
    p.add_argument('dataset', choices=['kitti', 'gtdb'])
    p.add_argument('--root', required=True)
    p.add_argument('--split', default='training')
    p.add_argument('--info-file', default=None)
    p.add_argument('--classes', nargs='+',
                   default=['Pedestrian', 'Cyclist', 'Car'])
    p.add_argument('--z-origin', default='auto',
                   choices=['auto', 'bottom', 'gravity'])
    args = p.parse_args()
    if args.dataset == 'kitti':
        info = create_kitti_infos(args.root, args.split)
        create_gt_database(args.root, info, args.classes,
                           z_origin=args.z_origin)
    elif args.dataset == 'gtdb':
        create_gt_database(args.root, args.info_file, args.classes,
                           z_origin=args.z_origin)


if __name__ == '__main__':
    main()
