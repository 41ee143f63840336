#!/usr/bin/env python
"""nuScenes raw → info-pkl converter WITHOUT the nuscenes-devkit.

Ref: tools/dataset_converters/nuscenes_converter.py:28-146
(create_nuscenes_infos / _fill_trainval_infos via the devkit). The devkit
is just a loader over the JSON tables; this reads them directly:
sample, sample_data, calibrated_sensor, sensor, ego_pose,
sample_annotation, instance, category, scene.

Output schema matches tpu_bev3d.datasets.NuScenesDataset (and the
reference's v1.x info format): per-sample lidar path, 6-cam image info
with lidar2cam/cam2img, 9-DoF LiDAR-frame boxes with velocity, sweeps.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def _quat_to_rot(q):
    """nuScenes quaternion [w, x, y, z] → 3×3 rotation."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float64)


def _pose_mat(rotation, translation):
    m = np.eye(4)
    m[:3, :3] = _quat_to_rot(rotation)
    m[:3, 3] = translation
    return m


def _load_tables(root, version):
    tdir = os.path.join(root, version)
    tables = {}
    for name in ('sample', 'sample_data', 'calibrated_sensor', 'sensor',
                 'ego_pose', 'sample_annotation', 'instance', 'category',
                 'scene'):
        with open(os.path.join(tdir, f'{name}.json')) as f:
            tables[name] = json.load(f)
    return tables


CAM_NAMES = ('CAM_FRONT', 'CAM_FRONT_RIGHT', 'CAM_FRONT_LEFT', 'CAM_BACK',
             'CAM_BACK_LEFT', 'CAM_BACK_RIGHT')

# nuScenes category → detection class (devkit category_to_detection_name)
DET_NAME = {
    'vehicle.car': 'car', 'vehicle.truck': 'truck',
    'vehicle.construction': 'construction_vehicle', 'vehicle.bus.bendy':
    'bus', 'vehicle.bus.rigid': 'bus', 'vehicle.trailer': 'trailer',
    'movable_object.barrier': 'barrier', 'vehicle.motorcycle':
    'motorcycle', 'vehicle.bicycle': 'bicycle',
    'human.pedestrian.adult': 'pedestrian',
    'human.pedestrian.child': 'pedestrian',
    'human.pedestrian.construction_worker': 'pedestrian',
    'human.pedestrian.police_officer': 'pedestrian',
    'movable_object.trafficcone': 'traffic_cone',
}

CLASSES = ['car', 'truck', 'construction_vehicle', 'bus', 'trailer',
           'barrier', 'motorcycle', 'bicycle', 'pedestrian',
           'traffic_cone']


def _project_box_2d(bbox_3d, lidar2cam, cam2img, im_w, im_h):
    """3D lidar box (GRAVITY-centered z, like the stored pkl schema) →
    clipped 2D xyxy + projected center + depth, or None if not visible
    (ref nuscenes_converter.py get_2d_boxes:409-539 +
    post_process_coords:541-573 — corner hull intersected with the image
    canvas)."""
    from tpu_bev3d.structures.boxes3d import corners_lidar
    box = np.asarray(bbox_3d, np.float32).copy()
    box[2] -= box[5] / 2          # corners_lidar wants bottom-centered z
    corners = corners_lidar(box[None])[0]
    hom = np.concatenate([corners, np.ones((8, 1), np.float32)], -1)
    cam = hom @ np.asarray(lidar2cam, np.float32).T        # [8, 4]
    near = 0.1
    in_front = cam[:, 2] > near
    if not in_front.any():
        return None
    # Clip the 12 box edges against the z=near plane before projecting
    # (ref post_process_coords intersects the projected hull with the
    # canvas; without clipping, boxes straddling the image plane project
    # behind-camera corners to bogus uv and get distorted extents).
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
             (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
    pts3 = [c[:3] for c in cam if c[2] > near]
    for a, b in edges:
        za, zb = cam[a, 2], cam[b, 2]
        if (za > near) != (zb > near):
            t = (near - za) / (zb - za)
            pts3.append(cam[a, :3] + t * (cam[b, :3] - cam[a, :3]))
    pts3 = np.asarray(pts3, np.float32)
    K = np.asarray(cam2img, np.float32)
    pts = pts3 @ K.T
    uv = pts[:, :2] / pts[:, 2:3]
    x0, y0 = uv.min(0)
    x1, y1 = uv.max(0)
    x0, x1 = np.clip([x0, x1], 0, im_w - 1)
    y0, y1 = np.clip([y0, y1], 0, im_h - 1)
    if x1 - x0 < 1 or y1 - y0 < 1:
        return None
    # projected 3D center (gravity center) + its camera depth
    ctr = np.asarray(bbox_3d[:3], np.float32)
    c = np.asarray(lidar2cam, np.float32) @ np.append(ctr, 1.0)
    if c[2] <= 0.1:
        return None
    cuv = (K @ c[:3])[:2] / c[2]
    return dict(bbox=[float(x0), float(y0), float(x1), float(y1)],
                center2d=[float(cuv[0]), float(cuv[1])],
                depth=float(c[2]))


def create_nuscenes_infos(root, version='v1.0-mini', out_file=None,
                          max_sweeps=10, classes=None, name_map=None,
                          with_velocity=True, with_2d_anns=True):
    """classes/name_map/with_velocity overrides support Lyft's
    nuScenes-schema tables (tools/lyft_converter.py)."""
    CLASSES_ = list(classes) if classes is not None else CLASSES
    DET_NAME_ = dict(name_map) if name_map is not None else (
        DET_NAME if classes is None else
        {c: c for c in CLASSES_})
    t = _load_tables(root, version)
    by_tok = {name: {r['token']: r for r in rows}
              for name, rows in t.items()}
    sd_by_sample = {}
    for sd in t['sample_data']:
        if sd['is_key_frame']:
            sd_by_sample.setdefault(sd['sample_token'], []).append(sd)

    # annotation velocity via neighbor anns of the same instance
    ann_by_tok = by_tok['sample_annotation']

    def velocity(ann):
        p, n = ann.get('prev', ''), ann.get('next', '')
        if not p and not n:
            return np.zeros(2, np.float32)
        a = ann_by_tok.get(p) or ann
        b = ann_by_tok.get(n) or ann
        ta = by_tok['sample'][a['sample_token']]['timestamp']
        tb = by_tok['sample'][b['sample_token']]['timestamp']
        if tb == ta:
            return np.zeros(2, np.float32)
        d = (np.asarray(b['translation'][:2])
             - np.asarray(a['translation'][:2])) / ((tb - ta) * 1e-6)
        return d.astype(np.float32)

    data_list = []
    for sample in t['sample']:
        sds = {by_tok['sensor'][by_tok['calibrated_sensor'][
            sd['calibrated_sensor_token']]['sensor_token']]['channel']: sd
            for sd in sd_by_sample.get(sample['token'], [])}
        if 'LIDAR_TOP' not in sds:
            continue
        lsd = sds['LIDAR_TOP']
        lcs = by_tok['calibrated_sensor'][lsd['calibrated_sensor_token']]
        lep = by_tok['ego_pose'][lsd['ego_pose_token']]
        lidar2ego = _pose_mat(lcs['rotation'], lcs['translation'])
        ego2global = _pose_mat(lep['rotation'], lep['translation'])
        global2lidar = np.linalg.inv(ego2global @ lidar2ego)

        info = dict(
            sample_idx=sample['token'], token=sample['token'],
            timestamp=sample['timestamp'],
            lidar_points=dict(lidar_path=lsd['filename'],
                              num_pts_feats=5))
        # cameras
        images = {}
        for cam in CAM_NAMES:
            if cam not in sds:
                continue
            csd = sds[cam]
            ccs = by_tok['calibrated_sensor'][csd['calibrated_sensor_token']]
            cep = by_tok['ego_pose'][csd['ego_pose_token']]
            cam2ego = _pose_mat(ccs['rotation'], ccs['translation'])
            cam_e2g = _pose_mat(cep['rotation'], cep['translation'])
            lidar2cam = np.linalg.inv(cam_e2g @ cam2ego) \
                @ (ego2global @ lidar2ego)
            images[cam] = dict(
                img_path=csd['filename'],
                width=csd.get('width', 1600),
                height=csd.get('height', 900),
                cam2img=np.asarray(ccs['camera_intrinsic'],
                                   np.float32).tolist(),
                lidar2cam=lidar2cam.astype(np.float32).tolist())
        if images:
            info['images'] = images
        # sweeps: previous non-keyframe lidar frames
        sweeps = []
        tok = lsd['prev']
        while tok and len(sweeps) < max_sweeps:
            # subset exports (and the devkit's own minival splits) can
            # reference prev frames outside the table — stop the walk
            if tok not in by_tok['sample_data']:
                break
            sd = by_tok['sample_data'][tok]
            scs = by_tok['calibrated_sensor'][sd['calibrated_sensor_token']]
            sep = by_tok['ego_pose'][sd['ego_pose_token']]
            s2g = _pose_mat(sep['rotation'], sep['translation']) \
                @ _pose_mat(scs['rotation'], scs['translation'])
            s2l = global2lidar @ s2g
            sweeps.append(dict(
                lidar_points=dict(lidar_path=sd['filename']),
                timestamp=sd['timestamp'],
                sensor2lidar_rotation=s2l[:3, :3].tolist(),
                sensor2lidar_translation=s2l[:3, 3].tolist()))
            tok = sd['prev']
        info['lidar_sweeps'] = sweeps
        # annotations → lidar frame 9-DoF
        instances = []
        for ann in t['sample_annotation']:
            if ann['sample_token'] != sample['token']:
                continue
            inst = by_tok['instance'][ann['instance_token']]
            cat = by_tok['category'][inst['category_token']]['name']
            det = DET_NAME_.get(cat)
            if det is None:
                continue
            ctr = global2lidar[:3, :3] @ np.asarray(ann['translation']) \
                + global2lidar[:3, 3]
            rot = global2lidar[:3, :3] @ _quat_to_rot(ann['rotation'])
            yaw = np.arctan2(rot[1, 0], rot[0, 0])
            w, l, h = ann['size']          # nuScenes: (w, l, h)
            if with_velocity:
                vel = velocity(ann)
                vel_l = global2lidar[:3, :3] @ np.array(
                    [vel[0], vel[1], 0.0])
            else:
                vel_l = np.zeros(3)
            # GRAVITY-centered z, matching the reference v2 pkl schema
            # exactly (mmdet3d stores the devkit translation = box center;
            # NuScenesDataset.parse_ann_info applies the -h/2 bottom shift
            # at load time for every nuScenes-schema pkl, ours included).
            instances.append(dict(
                bbox_3d=[float(ctr[0]), float(ctr[1]),
                         float(ctr[2]), float(l), float(w),
                         float(h), float(yaw)],
                bbox_label_3d=CLASSES_.index(det),
                velocity=[float(vel_l[0]), float(vel_l[1])],
                num_lidar_pts=ann.get('num_lidar_pts', 1)))
        info['instances'] = instances
        # per-camera 2D annotations for aux 2D supervision (StreamPETR
        # YOLOX/Focal heads; ref get_2d_boxes:409-539)
        if with_2d_anns and images:
            for cam, imi in images.items():
                anns2d = []
                for inst in instances:
                    r = _project_box_2d(
                        inst['bbox_3d'], imi['lidar2cam'],
                        imi['cam2img'], imi['width'], imi['height'])
                    if r is not None:
                        anns2d.append(dict(
                            **r, bbox_label=inst['bbox_label_3d']))
                imi['instances_2d'] = anns2d
        data_list.append(info)

    out_file = out_file or os.path.join(root, 'nuscenes_infos.pkl')
    with open(out_file, 'wb') as f:
        pickle.dump(dict(metainfo=dict(classes=CLASSES_, version=version),
                         data_list=data_list), f)
    print(f'wrote {len(data_list)} samples → {out_file}')
    return out_file


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--root', required=True)
    p.add_argument('--version', default='v1.0-mini')
    p.add_argument('--max-sweeps', type=int, default=10)
    p.add_argument('--out', default=None)
    a = p.parse_args()
    create_nuscenes_infos(a.root, a.version, a.out, a.max_sweeps)
