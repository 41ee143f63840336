"""Waymo converter stage-2 (info building) over synthetic frame dicts —
no TF/WOD dependency — plus WaymoDataset consuming the output."""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..',
                                'tools'))


def _frames(n=3):
    rng = np.random.default_rng(0)
    for i in range(n):
        yield dict(
            context='seg0', timestamp=1000 + i,
            points=rng.normal(size=(256, 4)).astype(np.float32) * 10,
            boxes=np.asarray([[5, 0, 0, 4, 2, 1.5, 0.2],
                              [10, 3, 0, 0.8, 0.8, 1.7, 0.0],
                              [1, 1, 0, 1, 1, 1, 0.0]], np.float32),
            names=['Car', 'Pedestrian', 'Sign'],   # Sign filtered out
            num_pts=np.asarray([50, 3, 9]),
            levels=np.asarray([1, 1, 1]),
            pose=np.eye(4, dtype=np.float32))


def test_build_waymo_infos(tmp_path):
    from waymo_converter import build_waymo_infos
    infos, pkl = build_waymo_infos(_frames(), str(tmp_path), 'training')
    assert len(infos) == 3
    data = pickle.load(open(pkl, 'rb'))
    assert data['metainfo']['classes'] == ['Car', 'Pedestrian', 'Cyclist']
    inst = data['data_list'][0]['instances']
    assert len(inst) == 2                       # Sign dropped
    # 3-point pedestrian downgraded to LEVEL_2 (converter rule)
    ped = [i for i in inst if i['bbox_label_3d'] == 1][0]
    assert ped['difficulty'] == 2
    # point bin exists and round-trips
    lp = data['data_list'][0]['lidar_points']['lidar_path']
    pts = np.fromfile(os.path.join(tmp_path, lp),
                      np.float32).reshape(-1, 4)
    assert pts.shape == (256, 4)

    from tpu_bev3d.datasets import WaymoDataset
    ds = WaymoDataset(data_root=str(tmp_path), ann_file=pkl, pipeline=[])
    assert len(ds) == 3
    ann = ds.get_data_info(0)['ann_info']
    assert ann['gt_bboxes_3d'].shape == (2, 7)
    assert list(ann['difficulty']) == [1, 2]


def test_lyft_eval_protocol():
    from tpu_bev3d.evaluation.functional.lyft_eval import lyft_eval
    gt = [dict(boxes=np.asarray([[0, 0, 0, 4, 2, 1.5, 0]], np.float32),
               labels=np.asarray([0]))]
    pred_exact = [dict(boxes=gt[0]['boxes'].copy(),
                       labels=np.asarray([0]),
                       scores=np.asarray([0.9], np.float32))]
    out = lyft_eval(pred_exact, gt, ['car'])
    assert out['car_AP'] == 1.0                 # perfect at every IoU thr
    shifted = gt[0]['boxes'].copy(); shifted[0, 0] += 1.0
    pred_shift = [dict(boxes=shifted, labels=np.asarray([0]),
                       scores=np.asarray([0.9], np.float32))]
    out2 = lyft_eval(pred_shift, gt, ['car'])
    assert 0.0 < out2['car_AP'] < 1.0           # fails the high-IoU thrs
