"""Devkit-free nuScenes converter on a synthetic mini nuScenes directory
(JSON tables + bin files)."""
import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..', 'tools'))


def _make_mini_nuscenes(root):
    v = root / 'v1.0-mini'
    os.makedirs(v, exist_ok=True)
    os.makedirs(root / 'samples/LIDAR_TOP', exist_ok=True)
    os.makedirs(root / 'samples/CAM_FRONT', exist_ok=True)
    ident = [1.0, 0.0, 0.0, 0.0]

    tables = dict(
        scene=[dict(token='sc0', name='scene0')],
        sample=[
            dict(token='s0', timestamp=1000000, scene_token='sc0',
                 prev='', next='s1'),
            dict(token='s1', timestamp=1500000, scene_token='sc0',
                 prev='s0', next=''),
        ],
        sensor=[dict(token='se_l', channel='LIDAR_TOP',
                     modality='lidar'),
                dict(token='se_c', channel='CAM_FRONT',
                     modality='camera')],
        calibrated_sensor=[
            dict(token='cs_l', sensor_token='se_l', rotation=ident,
                 translation=[0.9, 0, 1.8], camera_intrinsic=[]),
            dict(token='cs_c', sensor_token='se_c',
                 rotation=[0.5, -0.5, 0.5, -0.5],
                 translation=[1.7, 0, 1.5],
                 camera_intrinsic=[[1000, 0, 800], [0, 1000, 450],
                                   [0, 0, 1]]),
        ],
        ego_pose=[
            dict(token='ep0', rotation=ident, translation=[100, 50, 0],
                 timestamp=1000000),
            dict(token='ep1', rotation=ident, translation=[105, 50, 0],
                 timestamp=1500000),
        ],
        sample_data=[
            dict(token='sd_l0', sample_token='s0',
                 calibrated_sensor_token='cs_l', ego_pose_token='ep0',
                 filename='samples/LIDAR_TOP/0.bin', is_key_frame=True,
                 timestamp=1000000, prev='', next=''),
            dict(token='sd_c0', sample_token='s0',
                 calibrated_sensor_token='cs_c', ego_pose_token='ep0',
                 filename='samples/CAM_FRONT/0.jpg', is_key_frame=True,
                 timestamp=1000000, prev='', next=''),
            dict(token='sd_l1', sample_token='s1',
                 calibrated_sensor_token='cs_l', ego_pose_token='ep1',
                 filename='samples/LIDAR_TOP/1.bin', is_key_frame=True,
                 timestamp=1500000, prev='', next=''),
        ],
        category=[dict(token='cat_car', name='vehicle.car')],
        instance=[dict(token='in0', category_token='cat_car')],
        sample_annotation=[
            dict(token='a0', sample_token='s0', instance_token='in0',
                 translation=[110, 52, 1.0], size=[2.0, 4.5, 1.6],
                 rotation=ident, prev='', next='a1', num_lidar_pts=30),
            dict(token='a1', sample_token='s1', instance_token='in0',
                 translation=[112, 52, 1.0], size=[2.0, 4.5, 1.6],
                 rotation=ident, prev='a0', next='', num_lidar_pts=30),
        ],
    )
    for name, rows in tables.items():
        with open(v / f'{name}.json', 'w') as f:
            json.dump(rows, f)
    pts = np.random.default_rng(0).uniform(
        -20, 20, (300, 5)).astype(np.float32)
    # plant a cluster inside the annotated box (lidar-frame gravity
    # center (9.1, 2, -0.8)) so in-box point counts are testable
    inbox = np.random.default_rng(1).uniform(
        -0.3, 0.3, (20, 5)).astype(np.float32)
    inbox[:, :3] += np.asarray([9.1, 2.0, -0.8], np.float32)
    pts = np.concatenate([pts, inbox], 0)
    pts.tofile(root / 'samples/LIDAR_TOP/0.bin')
    pts.tofile(root / 'samples/LIDAR_TOP/1.bin')


def test_nuscenes_converter(tmp_path):
    from nuscenes_converter import create_nuscenes_infos
    _make_mini_nuscenes(tmp_path)
    out = create_nuscenes_infos(str(tmp_path), 'v1.0-mini')
    with open(out, 'rb') as f:
        data = pickle.load(f)
    infos = data['data_list']
    assert len(infos) == 2
    i0 = infos[0]
    assert 'CAM_FRONT' in i0['images']
    inst = i0['instances'][0]
    box = np.asarray(inst['bbox_3d'])
    # ann global (110,52,1) − ego (100,50,0) − lidar mount (0.9,0,1.8):
    # center (9.1, 2, -0.8); bbox stores GRAVITY z (reference v2 schema;
    # the dataset applies the bottom shift at parse time)
    assert np.allclose(box[:3], [9.1, 2.0, -0.8], atol=1e-4)
    # nuScenes size (w,l,h) → (dx=l, dy=w, dz=h)
    assert np.allclose(box[3:6], [4.5, 2.0, 1.6], atol=1e-5)
    # velocity ≈ (112-110)/0.5s = 4 m/s along x
    assert np.allclose(inst['velocity'], [4.0, 0.0], atol=1e-3)

    # loads through NuScenesDataset
    from tpu_bev3d.datasets import NuScenesDataset
    ds = NuScenesDataset(
        data_root=str(tmp_path), ann_file=os.path.basename(out),
        pipeline=[
            dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
            dict(type='LoadAnnotations3D'),
            dict(type='Pack3DDetInputs', num_points=512, max_gt=8,
                 box_dim=9)])
    s = ds[0]
    assert s['gt_bboxes_3d'].shape == (8, 9)
    assert s['gt_mask'].sum() == 1
    # dataset parse applies exactly ONE gravity→bottom shift on
    # own-converter pkls (advisor r2 high: double-shift regression)
    gt0 = s['gt_bboxes_3d'][0]
    assert np.allclose(gt0[2], -0.8 - 0.8, atol=1e-4)
    # points_in_rbbox counts with the parsed box match the hand-derived
    # bottom-centered box (catches any residual z offset end-to-end)
    from tpu_bev3d.structures import points_in_rbbox
    pts = np.fromfile(str(tmp_path / 'samples/LIDAR_TOP/0.bin'),
                      np.float32).reshape(-1, 5)[:, :3]
    manual = np.asarray(
        [[9.1, 2.0, -1.6, 4.5, 2.0, 1.6, gt0[6]]], np.float32)
    got = points_in_rbbox(pts, np.asarray(gt0[None, :7]))
    want = points_in_rbbox(pts, manual)
    assert (got == want).all() and want.sum() > 0

    # 2D annotations: the converter projects the instance into CAM_FRONT
    anns2d = i0['images']['CAM_FRONT'].get('instances_2d')
    assert anns2d is not None
    if anns2d:   # visibility depends on geometry; when visible, check
        a = anns2d[0]
        x0, y0, x1, y1 = a['bbox']
        assert x1 > x0 and y1 > y0 and a['depth'] > 0
        assert x0 <= a['center2d'][0] <= x1 + 50

    # packing: max_gt_2d emits padded per-camera 2D GT
    ds2 = NuScenesDataset(
        data_root=str(tmp_path), ann_file=os.path.basename(out),
        modality=dict(use_lidar=True, use_camera=True),
        pipeline=[
            dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
            dict(type='LoadAnnotations3D'),
            dict(type='Pack3DDetInputs', num_points=512, max_gt=8,
                 box_dim=9, max_gt_2d=4)])
    s2 = ds2[0]
    assert s2['gt_bboxes_2d'].shape == (1, 4, 4)   # 1 camera, 4 slots
    assert s2['centers2d'].shape == (1, 4, 2)
    assert s2['gt_mask_2d'].shape == (1, 4)
    assert s2['gt_mask_2d'].sum() == len(anns2d)
