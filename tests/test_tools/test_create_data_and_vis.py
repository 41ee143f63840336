"""create_data KITTI converter + GT database + visualizer smoke tests."""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..', 'tools'))


def _make_raw_kitti(root):
    os.makedirs(root / 'training/velodyne', exist_ok=True)
    os.makedirs(root / 'training/label_2', exist_ok=True)
    os.makedirs(root / 'training/calib', exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        pts = rng.uniform([0, -20, -2, 0], [40, 20, 1, 1],
                          (800, 4)).astype(np.float32)
        # plant points inside the object at lidar (10, 2, -0.5)
        obj = rng.uniform([9, 1.5, -1.0, 0], [11, 2.5, 0.2, 1],
                          (50, 4)).astype(np.float32)
        np.concatenate([pts, obj]).tofile(
            root / f'training/velodyne/{i:06d}.bin')
        # camera-frame label: x right, y down, z forward; lidar x fwd ->
        # cam z; choose Tr as the standard axis permutation
        with open(root / f'training/label_2/{i:06d}.txt', 'w') as f:
            # location in camera frame = (-y_l, -z_l, x_l)
            f.write('Car 0 0 0 0 0 50 50 1.5 1.7 4.0 -2.0 0.5 10.0 0.0\n')
        with open(root / f'training/calib/{i:06d}.txt', 'w') as f:
            f.write('P2: 700 0 600 0 0 700 180 0 0 0 1 0\n')
            f.write('R0_rect: 1 0 0 0 1 0 0 0 1\n')
            # velo->cam: x_c=-y_l, y_c=-z_l, z_c=x_l
            f.write('Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n')


def test_kitti_converter_and_gtdb(tmp_path):
    from create_data import create_gt_database, create_kitti_infos
    _make_raw_kitti(tmp_path)
    info_file = create_kitti_infos(str(tmp_path))
    with open(info_file, 'rb') as f:
        infos = pickle.load(f)['data_list']
    assert len(infos) == 2
    inst = infos[0]['instances'][0]
    box = np.asarray(inst['bbox_3d'])
    # cam (x=-2, y=0.5, z=10) → lidar (10, 2, -0.5)
    assert np.allclose(box[:3], [10, 2, -0.5], atol=1e-4)
    assert inst['bbox_label_3d'] == 'Car'

    db_pkl = create_gt_database(str(tmp_path), info_file,
                                ['Pedestrian', 'Cyclist', 'Car'])
    with open(db_pkl, 'rb') as f:
        db = pickle.load(f)
    assert len(db['Car']) == 2
    assert db['Car'][0]['num_points_in_gt'] > 0

    # the produced pkl loads through KittiDataset
    from tpu_bev3d.datasets import KittiDataset
    ds = KittiDataset(
        data_root=str(tmp_path), ann_file=os.path.basename(info_file),
        pipeline=[
            dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
            dict(type='LoadAnnotations3D'),
            dict(type='Pack3DDetInputs', num_points=1024, max_gt=8)])
    s = ds[0]
    assert s['gt_mask'].sum() == 1


def test_visualizer(tmp_path):
    from tpu_bev3d.visualization import Det3DVisualizer
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (500, 3))
    boxes = np.array([[5, 5, 0, 4, 2, 1.5, 0.4],
                      [-10, 3, 0, 2, 1, 1.7, -0.2]], np.float32)
    vis = Det3DVisualizer(classes=['car', 'ped'])
    out = vis.draw_bev(points=pts, gt_bboxes=boxes, pred_bboxes=boxes,
                       pred_labels=np.array([0, 1]),
                       out_file=str(tmp_path / 'bev.png'))
    assert os.path.getsize(out) > 1000
    img = np.zeros((256, 704, 3), np.float32)
    l2i = np.eye(4, dtype=np.float32)
    l2i[:3, :3] = [[700, 0, 600], [0, 700, 180], [0, 0, 1]]
    out2 = vis.draw_proj_bboxes_on_image(
        img, boxes, l2i, out_file=str(tmp_path / 'proj.png'))
    assert os.path.getsize(out2) > 1000
