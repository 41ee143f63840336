"""Waymo Open Dataset → info-pkl converter.

Ref: tools/dataset_converters/waymo_converter.py:1-723 — the reference
decodes TFRecord Frame protos with the waymo-open-dataset package and
emits KITTI-format files. This converter separates the two stages:

1. TFRecord decode (`decode_tfrecord_frames`) — requires the optional
   `waymo_open_dataset` + `tensorflow` packages (same as the reference);
   each frame becomes a plain dict (points, boxes, names, num_pts,
   difficulty, pose, cams).
2. info building (`build_waymo_infos`) — pure numpy over frame dicts:
   writes point bins, maps Waymo types → classes, computes LEVEL
   difficulty (≤5 pts → LEVEL_2, ref waymo_converter difficulty rule),
   fills the shared info-pkl schema consumed by WaymoDataset.

Stage 2 is unit-tested on synthetic frame dicts (no TF dependency).

Usage: python tools/waymo_converter.py --root data/waymo --out-dir
data/waymo_converted
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

TYPE_TO_CLASS = {1: 'Car', 2: 'Pedestrian', 4: 'Cyclist', 3: 'Sign'}
CLASSES = ('Car', 'Pedestrian', 'Cyclist')


def decode_tfrecord_frames(tfrecord_path):
    """Yield plain frame dicts from one TFRecord segment. Requires the
    optional waymo_open_dataset/tensorflow deps (gated like the
    reference's converter)."""
    try:
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2
        from waymo_open_dataset.utils import frame_utils
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            'TFRecord decoding needs waymo-open-dataset-tf + tensorflow; '
            'install them or feed pre-decoded frame dicts to '
            'build_waymo_infos().') from e
    ds = tf.data.TFRecordDataset(tfrecord_path, compression_type='')
    for data in ds:  # pragma: no cover - optional dependency
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        pts, _ = frame_utils.convert_range_image_to_point_cloud(
            frame, *frame_utils.parse_range_image_and_camera_projection(
                frame))
        points = np.concatenate(pts, axis=0).astype(np.float32)
        boxes, names, num_pts, levels = [], [], [], []
        for lab in frame.laser_labels:
            b = lab.box
            boxes.append([b.center_x, b.center_y,
                          b.center_z - b.height / 2.0,
                          b.length, b.width, b.height, b.heading])
            names.append(TYPE_TO_CLASS.get(lab.type, 'DontCare'))
            num_pts.append(lab.num_lidar_points_in_box)
            levels.append(lab.detection_difficulty_level or 1)
        yield dict(
            timestamp=frame.timestamp_micros,
            context=frame.context.name,
            points=points,
            boxes=np.asarray(boxes, np.float32).reshape(-1, 7),
            names=names,
            num_pts=np.asarray(num_pts, np.int32),
            levels=np.asarray(levels, np.int32),
            pose=np.asarray(frame.pose.transform,
                            np.float32).reshape(4, 4))


def build_waymo_infos(frames, out_dir, split='training'):
    """frames: iterable of frame dicts (see decode_tfrecord_frames) →
    (infos list, pkl path). Pure numpy — unit-testable without TF."""
    pts_dir = os.path.join(out_dir, split, 'velodyne')
    os.makedirs(pts_dir, exist_ok=True)
    infos = []
    for i, f in enumerate(frames):
        token = f.get('context', 'seg') + f'_{i:06d}'
        bin_path = os.path.join(split, 'velodyne', f'{token}.bin')
        pts = np.asarray(f['points'], np.float32)
        if pts.shape[1] == 3:   # pad intensity
            pts = np.concatenate(
                [pts, np.zeros((len(pts), 1), np.float32)], -1)
        pts.tofile(os.path.join(out_dir, bin_path))
        names = list(f['names'])
        keep = [j for j, n in enumerate(names) if n in CLASSES]
        boxes = np.asarray(f['boxes'], np.float32).reshape(-1, 7)[keep]
        labels = np.asarray([CLASSES.index(names[j]) for j in keep],
                            np.int64)
        num_pts = np.asarray(f.get('num_pts',
                                   np.full(len(names), 99)))[keep]
        levels = np.asarray(f.get('levels',
                                  np.ones(len(names), np.int32)))[keep]
        # the converter's difficulty rule (ref waymo_converter.py: labels
        # with <=5 points are LEVEL_2 regardless of annotation)
        levels = np.where(num_pts <= 5, 2, levels)
        instances = []
        for j in range(len(boxes)):
            instances.append(dict(
                bbox_3d=boxes[j].tolist(),
                bbox_label_3d=int(labels[j]),
                num_lidar_pts=int(num_pts[j]),
                difficulty=int(levels[j])))
        infos.append(dict(
            sample_idx=token,
            timestamp=f.get('timestamp', 0),
            ego2global=np.asarray(f.get('pose', np.eye(4))).tolist(),
            lidar_points=dict(lidar_path=bin_path, num_pts_feats=4),
            instances=instances))
    out = dict(metainfo=dict(dataset='waymo', classes=list(CLASSES)),
               data_list=infos)
    pkl_path = os.path.join(out_dir, f'waymo_infos_{split}.pkl')
    with open(pkl_path, 'wb') as fh:
        pickle.dump(out, fh)
    return infos, pkl_path


def main():  # pragma: no cover - CLI wrapper
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True,
                    help='dir with *.tfrecord segments')
    ap.add_argument('--out-dir', required=True)
    ap.add_argument('--split', default='training')
    args = ap.parse_args()
    segs = sorted(f for f in os.listdir(args.root)
                  if f.endswith('.tfrecord'))

    def frames():
        for s in segs:
            yield from decode_tfrecord_frames(os.path.join(args.root, s))

    infos, pkl = build_waymo_infos(frames(), args.out_dir, args.split)
    print(f'wrote {len(infos)} infos -> {pkl}')


if __name__ == '__main__':
    main()
