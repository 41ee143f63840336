#!/usr/bin/env python
"""Custom-scene → info-pkl converter (ref
tools/dataset_converters/custom_scene_converter.py:14 + the BEVFusion
CustomDataset). Input layout:

    root/
      points/*.bin        float32 [N, point_dim] clouds
      annotations/*.json  [{"bbox_3d": [x,y,z,dx,dy,dz,yaw],
                            "label": "car"}, ...] (optional per frame)

Writes {metainfo, data_list} pkl consumable by CustomDataset.
"""
import argparse
import glob
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

CLASSES = ['car', 'truck', 'bus', 'pedestrian', 'bicycle']


def create_custom_infos(root, out_file=None, point_dim=4,
                        classes=CLASSES):
    data_list = []
    for i, p in enumerate(sorted(glob.glob(
            os.path.join(root, 'points', '*.bin')))):
        rel = os.path.relpath(p, root)
        stem = os.path.splitext(os.path.basename(p))[0]
        info = dict(sample_idx=stem,
                    lidar_points=dict(lidar_path=rel,
                                      num_pts_feats=point_dim))
        ann = os.path.join(root, 'annotations', stem + '.json')
        instances = []
        if os.path.exists(ann):
            with open(ann) as f:
                for a in json.load(f):
                    if a.get('label') not in classes:
                        continue
                    instances.append(dict(
                        bbox_3d=[float(v) for v in a['bbox_3d']],
                        bbox_label_3d=classes.index(a['label']),
                        num_lidar_pts=int(a.get('num_lidar_pts', 1))))
        info['instances'] = instances
        data_list.append(info)
    out_file = out_file or os.path.join(root, 'custom_infos.pkl')
    with open(out_file, 'wb') as f:
        pickle.dump(dict(metainfo=dict(classes=list(classes)),
                         data_list=data_list), f)
    print(f'wrote {len(data_list)} samples -> {out_file}')
    return out_file


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('root')
    ap.add_argument('--out', default=None)
    ap.add_argument('--point-dim', type=int, default=4)
    args = ap.parse_args()
    create_custom_infos(args.root, args.out, args.point_dim)
