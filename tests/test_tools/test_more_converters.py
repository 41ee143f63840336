"""Indoor / SemanticKITTI converters + v1→v2 info migration + indoor/
instance/panoptic metric goldens."""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..',
                                'tools'))


def test_indoor_converter(tmp_path):
    from indoor_converter import build_indoor_infos
    os.makedirs(tmp_path / 'points')
    os.makedirs(tmp_path / 'train_bboxes')
    rng = np.random.default_rng(0)
    for sc in ('scene0', 'scene1'):
        rng.normal(size=(100, 6)).astype(np.float32).tofile(
            tmp_path / 'points' / f'{sc}.bin')
        boxes = np.concatenate(
            [rng.uniform(-3, 3, (4, 3)), rng.uniform(0.5, 2, (4, 3)),
             rng.integers(0, 18, (4, 1)).astype(float)], -1)
        np.save(tmp_path / 'train_bboxes' / f'{sc}.npy', boxes)
    infos, out = build_indoor_infos(str(tmp_path), 'scannet', 'train')
    assert len(infos) == 2
    data = pickle.load(open(out, 'rb'))
    inst = data['data_list'][0]['instances']
    assert len(inst) == 4 and len(inst[0]['bbox_3d']) == 7


def test_semantickitti_converter(tmp_path):
    from semantickitti_converter import build_semantickitti_infos
    seq = tmp_path / 'sequences' / '08'
    os.makedirs(seq / 'velodyne')
    os.makedirs(seq / 'labels')
    for i in range(3):
        np.zeros((10, 4), np.float32).tofile(
            seq / 'velodyne' / f'{i:06d}.bin')
        np.zeros((10,), np.uint32).tofile(seq / 'labels'
                                          / f'{i:06d}.label')
    infos, out = build_semantickitti_infos(str(tmp_path), 'val')
    assert len(infos) == 3
    assert infos[0]['pts_semantic_mask_path'].endswith('.label')


def test_update_infos_to_v2(tmp_path):
    from update_infos_to_v2 import update_pkl_infos
    v1 = dict(infos=[dict(
        point_cloud=dict(idx=7, velodyne_path='velodyne/000007.bin'),
        annos=dict(name=['Car', 'DontCare'],
                   location=[[1.0, 2.0, 10.0], [0, 0, 0]],
                   dimensions=[[3.9, 1.5, 1.6], [0, 0, 0]],
                   rotation_y=[0.3, 0.0],
                   occluded=[0, 0], truncated=[0.0, 0.0],
                   bbox=[[0, 0, 50, 50], [0, 0, 1, 1]],
                   num_points_in_gt=[55, 0]))])
    p_in = tmp_path / 'v1.pkl'
    p_out = tmp_path / 'v2.pkl'
    pickle.dump(v1, open(p_in, 'wb'))
    new = update_pkl_infos('kitti', str(p_in), str(p_out))
    inst = new['data_list'][0]['instances']
    assert len(inst) == 1                       # DontCare dropped
    assert inst[0]['bbox_3d'][3:6] == [3.9, 1.6, 1.5]  # l, w, h order


def test_indoor_and_panoptic_metrics():
    from tpu_bev3d.evaluation.functional.indoor_eval import (
        indoor_eval, instance_seg_eval, panoptic_seg_eval)
    gt = [dict(boxes=np.asarray([[0, 0, 0, 2, 2, 2, 0]], np.float32),
               labels=np.asarray([0]))]
    pred = [dict(boxes=gt[0]['boxes'].copy(), labels=np.asarray([0]),
                 scores=np.asarray([0.9], np.float32))]
    out = indoor_eval(pred, gt, ['chair'])
    assert out['mAP_0.25'] == 1.0 and out['mAP_0.50'] == 1.0

    P = 50
    gm = np.zeros((2, P), bool); gm[0, :20] = True; gm[1, 30:] = True
    pm = np.zeros((2, P), bool); pm[0, :18] = True; pm[1, 31:] = True
    ig = [dict(masks=gm, labels=np.asarray([0, 1]))]
    ip = [dict(masks=pm, labels=np.asarray([0, 1]),
               scores=np.asarray([0.9, 0.8], np.float32))]
    iout = instance_seg_eval(ip, ig, ['a', 'b'])
    assert iout['inst_mAP_0.50'] == 1.0

    sem = np.zeros(P, np.int64); sem[30:] = 1
    inst = np.zeros(P, np.int64); inst[:20] = 1; inst[30:] = 2
    gpan = [dict(sem=sem, inst=inst)]
    ppan = [dict(sem=sem.copy(), inst=inst.copy())]
    pout = panoptic_seg_eval(ppan, gpan, ['a', 'b'])
    assert pout['PQ'] == 1.0


def test_nuimages_converter(tmp_path):
    import json
    from nuimages_converter import create_nuimages_coco
    tdir = tmp_path / 'v1.0-mini'
    os.makedirs(tdir)
    json.dump([dict(token='sd0', is_key_frame=True,
                    filename='samples/CAM_FRONT/a.jpg',
                    width=1600, height=900),
               dict(token='sd1', is_key_frame=False,
                    filename='sweeps/CAM_FRONT/b.jpg')],
              open(tdir / 'sample_data.json', 'w'))
    json.dump([dict(token='c0', name='vehicle.car'),
               dict(token='c1', name='animal')],
              open(tdir / 'category.json', 'w'))
    json.dump([dict(sample_data_token='sd0', category_token='c0',
                    bbox=[10, 20, 110, 80]),
               dict(sample_data_token='sd0', category_token='c1',
                    bbox=[0, 0, 5, 5]),
               dict(sample_data_token='sd1', category_token='c0',
                    bbox=[1, 1, 2, 2])],
              open(tdir / 'object_ann.json', 'w'))
    coco, out = create_nuimages_coco(str(tmp_path), 'v1.0-mini')
    assert len(coco['images']) == 1          # keyframes only
    assert len(coco['annotations']) == 1     # animal + sweep dropped
    a = coco['annotations'][0]
    assert a['bbox'] == [10, 20, 100, 60]


def test_custom_scene_converter(tmp_path):
    """CustomDataset + custom_scene_converter round trip."""
    import json
    import pickle
    import numpy as np
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), 'tools'))
    from custom_scene_converter import create_custom_infos

    os.makedirs(tmp_path / 'points')
    os.makedirs(tmp_path / 'annotations')
    rng = np.random.default_rng(0)
    for i in range(2):
        rng.uniform(-20, 20, (200, 4)).astype(np.float32).tofile(
            tmp_path / 'points' / f'{i:06d}.bin')
    with open(tmp_path / 'annotations' / '000000.json', 'w') as f:
        json.dump([dict(bbox_3d=[1, 2, 0, 4, 2, 1.5, 0.3],
                        label='car'),
                   dict(bbox_3d=[5, 5, 0, 1, 1, 1.8, 0.0],
                        label='pedestrian'),
                   dict(bbox_3d=[0, 0, 0, 1, 1, 1, 0],
                        label='unknown')], f)
    out = create_custom_infos(str(tmp_path))
    with open(out, 'rb') as f:
        data = pickle.load(f)
    assert len(data['data_list']) == 2
    assert len(data['data_list'][0]['instances']) == 2  # unknown dropped

    from tpu_bev3d.datasets import CustomDataset
    ds = CustomDataset(
        data_root=str(tmp_path), ann_file='custom_infos.pkl',
        pipeline=[
            dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
            dict(type='LoadAnnotations3D'),
            dict(type='Pack3DDetInputs', num_points=256, max_gt=8)])
    s = ds[0]
    assert s['gt_mask'].sum() == 2
    assert s['points'].shape == (256, 4)


def test_nuimages_converter_instance_masks(tmp_path):
    import json
    import numpy as np
    from nuimages_converter import create_nuimages_coco
    from tpu_bev3d.utils.rle import mask_encode, rle_decode
    tdir = tmp_path / 'v1.0-mini'
    os.makedirs(tdir)
    H, W = 90, 160
    json.dump([dict(token='sd0', is_key_frame=True,
                    filename='samples/CAM_FRONT/a.jpg',
                    width=W, height=H)],
              open(tdir / 'sample_data.json', 'w'))
    json.dump([dict(token='c0', name='vehicle.car'),
               dict(token='c1', name='flat.driveable_surface')],
              open(tdir / 'category.json', 'w'))
    car = np.zeros((H, W), np.uint8); car[20:40, 30:60] = 1
    road = np.zeros((H, W), np.uint8); road[60:, :] = 1
    json.dump([dict(token='t0', sample_data_token='sd0',
                    category_token='c0', bbox=[30, 20, 60, 40],
                    mask=mask_encode(car, b64=True))],
              open(tdir / 'object_ann.json', 'w'))
    json.dump([dict(token='s0', sample_data_token='sd0',
                    category_token='c1',
                    mask=mask_encode(road, b64=True))],
              open(tdir / 'surface_ann.json', 'w'))
    semdir = str(tmp_path / 'semseg')
    coco, _ = create_nuimages_coco(str(tmp_path), 'v1.0-mini',
                                   semseg_dir=semdir)
    a = coco['annotations'][0]
    # segmentation is standard COCO compressed RLE (plain counts str,
    # ref nuimage_converter.py:129-133) and decodes back to the mask
    seg = a['segmentation']
    assert isinstance(seg['counts'], str)
    assert (rle_decode(seg) == car).all()
    # semantic-seg map: surface below (index 2 = driveable, last),
    # object on top (index 1 = car)
    from PIL import Image
    sem = np.asarray(Image.open(os.path.join(semdir, 'a.png')))
    assert sem[30, 40] == 1          # car pixel
    assert sem[80, 40] == 2          # road pixel
    assert sem[0, 0] == 0            # background
