"""Real-data validation harness (VERDICT r1 item 1).

Runs the dataset layer, coordinate conversions, pipelines, metrics, and
a model predict against the vendored REAL miniature fixtures under
tests/data/ (see tests/data/README.md for provenance):

- tests/data/kitti — reference v2 info pkl (camera-frame boxes,
  categories table) + real velodyne bins.
- tests/data/demo/kitti — real 17k-point cloud, 10 real instances with
  per-box num_lidar_pts (exact coordinate-fidelity oracle).
- tests/data/nuscenes — 2 real keyframes, old-metainfo pkl (CLASSES in
  devkit order ≠ our class order → exercises the label remap), sweeps.
- tests/data/demo/nuscenes — full real frame: 34k-pt cloud + 6 cameras
  + v2 pkl with 69 instances.
"""
import os
import pickle

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), '..', 'data')
KITTI = os.path.join(DATA, 'kitti')
NUS = os.path.join(DATA, 'nuscenes')
DEMO_KITTI = os.path.join(DATA, 'demo', 'kitti')
DEMO_NUS = os.path.join(DATA, 'demo', 'nuscenes')
NUS_DEMO_PKL = 'n015-2018-07-24-11-22-45+0800.pkl'

LOAD_K = [dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
          dict(type='LoadAnnotations3D')]


def test_kitti_real_info_pkl():
    """Reference v2 KITTI pkl loads: categories remap (Van→-1 dropped),
    camera→lidar box conversion, data_prefix path resolution."""
    from tpu_bev3d.datasets import KittiDataset
    ds = KittiDataset(data_root=KITTI, ann_file='kitti_infos_train.pkl',
                      data_prefix=dict(pts='training/velodyne'),
                      pipeline=LOAD_K)
    assert len(ds) == 1
    # categories table: Pedestrian/Cyclist/Car keep ids, Van..Misc → -1
    assert ds.label_remap[0] == 0 and ds.label_remap[2] == 2
    assert ds.label_remap[3] == -1
    info = ds.get_data_info(0)
    assert os.path.isfile(info['lidar_path'])
    ann = info['ann_info']
    # the single GT is the Pedestrian at cam (1.84, 1.47, 8.41): in lidar
    # it must sit ~8.7 m ahead (x), slightly left (y<0), bottom below
    # the sensor, with dims (l=1.2, w=0.48, h=1.89)
    assert ann['gt_labels_3d'].tolist() == [0]
    b = ann['gt_bboxes_3d'][0]
    assert 8.0 < b[0] < 9.5 and -3 < b[1] < 0 and -2.5 < b[2] < -1
    np.testing.assert_allclose(b[3:6], [1.2, 0.48, 1.89], atol=1e-5)
    s = ds.prepare_data(0)
    assert s['points'].shape[1] == 4 and len(s['points']) > 100


def test_kitti_demo_real_cloud_exact_point_counts():
    """The strongest coordinate oracle: converting the demo frame's
    camera-frame GT to lidar and counting cloud points inside each box
    must reproduce the annotation's num_lidar_pts EXACTLY (it does for
    all 6 non-DontCare cars: 1325/1900/881/659/55/162)."""
    from tpu_bev3d.datasets import KittiDataset
    from tpu_bev3d.structures.boxes3d import points_in_rbbox
    ds = KittiDataset(data_root=DEMO_KITTI, ann_file='000008.pkl',
                      pipeline=LOAD_K)
    info = ds.get_data_info(0)
    ann = info['ann_info']
    assert len(ann['gt_labels_3d']) == 6  # 10 instances, 4 DontCare
    assert (ann['gt_labels_3d'] == 2).all()  # all cars
    s = ds.prepare_data(0)
    counts = points_in_rbbox(s['points'][:, :3],
                             ann['gt_bboxes_3d']).sum(0)
    with open(os.path.join(DEMO_KITTI, '000008.pkl'), 'rb') as f:
        raw = pickle.load(f)['data_list'][0]['instances']
    expected = [i['num_lidar_pts'] for i in raw if i['bbox_label_3d'] > -1]
    assert counts.tolist() == expected, (counts.tolist(), expected)


def test_nuscenes_real_info_pkl_with_remap_and_sweeps():
    """Old-metainfo nuScenes pkl: devkit class order remaps onto our
    order, sweeps resolve via data_prefix and concatenate, velocity
    makes 9-DoF boxes, boxes come out bottom-centered."""
    from tpu_bev3d.datasets import NuScenesDataset
    pipe = [dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
            dict(type='LoadPointsFromMultiSweeps', sweeps_num=2,
                 load_dim=5, use_dim=[0, 1, 2, 4], pad_empty_sweeps=True,
                 remove_close=True, test_mode=True),
            dict(type='LoadAnnotations3D')]
    ds = NuScenesDataset(
        data_root=NUS, ann_file='nus_info.pkl',
        data_prefix=dict(pts='samples/LIDAR_TOP',
                         sweeps='sweeps/LIDAR_TOP', img=''),
        modality=dict(use_lidar=True, use_camera=True), pipeline=pipe)
    assert len(ds) == 2
    # pkl CLASSES order: car,truck,trailer,bus,cv,... → ours:
    # trailer(pkl 2)→4, construction_vehicle(pkl 4)→2, barrier(pkl 9)→5
    assert ds.label_remap == {0: 0, 1: 1, 2: 4, 3: 3, 4: 2, 5: 7,
                              6: 6, 7: 8, 8: 9, 9: 5}
    info = ds.get_data_info(0)
    assert info['token'] == 'fd8420396768425eabec9bdddf7e64b6'
    ann = info['ann_info']
    assert ann['gt_bboxes_3d'].shape[1] == 9  # velocity appended
    assert np.isfinite(ann['gt_bboxes_3d']).all()  # nan velocities zeroed
    # raw pkl stores gravity-centered z; dataset must subtract h/2
    with open(os.path.join(NUS, 'nus_info.pkl'), 'rb') as f:
        raw = pickle.load(f)['data_list'][0]['instances']
    kept = [i for i in raw if i['num_lidar_pts'] > 0]
    exp_z = kept[0]['bbox_3d'][2] - kept[0]['bbox_3d'][5] / 2
    assert abs(ann['gt_bboxes_3d'][0, 2] - exp_z) < 1e-5
    s = ds.prepare_data(1)  # entry 1 has 2 real sweeps
    assert len(s['points']) > 0
    # dt channel (last) spans keyframe(0) and sweeps (~0.1 s)
    dt = s['points'][:, -1]
    assert dt.min() == 0.0 and 0.05 < dt.max() < 0.2
    # camera info resolved with per-dataset prefix
    assert len(info['img_paths']) == 6
    assert info['lidar2img'][0].shape == (4, 4)


def test_nuscenes_demo_real_frame_point_counts():
    """Full real frame: v2 pkl (categories, isvalid flags) through the
    dataset; ≥20 of the 28 ≥5-point GT boxes reproduce num_lidar_pts
    exactly after the gravity→bottom center shift."""
    from tpu_bev3d.datasets import NuScenesDataset
    from tpu_bev3d.structures.boxes3d import points_in_rbbox
    ds = NuScenesDataset(
        data_root=DEMO_NUS, ann_file=NUS_DEMO_PKL,
        use_valid_flag=True,
        pipeline=[dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
                  dict(type='LoadAnnotations3D')])
    assert ds.label_remap is not None  # categories order ≠ ours
    info = ds.get_data_info(0)
    ann = info['ann_info']
    s = ds.prepare_data(0)
    assert len(s['points']) > 30000  # real full cloud
    boxes = ann['gt_bboxes_3d'][:, :7].copy()
    counts = points_in_rbbox(s['points'][:, :3], boxes).sum(0)
    with open(os.path.join(DEMO_NUS, NUS_DEMO_PKL), 'rb') as f:
        raw = pickle.load(f)['data_list'][0]['instances']
    kept = [i for i in raw if i['bbox_3d_isvalid']]
    assert len(kept) == len(boxes)
    exp = np.asarray([i['num_lidar_pts'] for i in kept])
    sel = exp >= 5
    exact = (counts == exp)[sel].sum()
    close = (np.abs(counts - exp) <= np.maximum(2, 0.1 * exp))[sel]
    assert exact >= 20, (exact, sel.sum())
    assert close.all(), list(zip(counts[sel], exp[sel]))


def test_kitti_real_eval_gt_as_predictions():
    """The full official-protocol KITTI eval run on REAL annotations:
    GT fed back as detections (replicated to fill the 41-recall-point
    protocol) scores near-perfect AP40, and beats perturbed boxes."""
    from tpu_bev3d.datasets import KittiDataset
    from tpu_bev3d.evaluation.functional.kitti_eval import kitti_eval
    ds = KittiDataset(data_root=DEMO_KITTI, ann_file='000008.pkl',
                      pipeline=LOAD_K)
    ann = ds.get_data_info(0)['ann_info']
    with open(os.path.join(DEMO_KITTI, '000008.pkl'), 'rb') as f:
        raw = pickle.load(f)['data_list'][0]['instances']
    kept = [i for i in raw if i['bbox_label_3d'] > -1]
    gt_one = dict(boxes=ann['gt_bboxes_3d'], labels=ann['gt_labels_3d'],
                  names=['Car'] * len(kept),
                  bbox2d=np.asarray([i['bbox'] for i in kept], np.float32),
                  occluded=np.asarray([i['occluded'] for i in kept]),
                  truncated=np.asarray([i['truncated'] for i in kept]))
    rng = np.random.default_rng(0)
    gts, preds, preds_bad = [], [], []
    for _ in range(10):
        gts.append(gt_one)
        preds.append(dict(boxes=gt_one['boxes'], labels=gt_one['labels'],
                          scores=rng.uniform(0.5, 1.0, len(kept))
                          .astype(np.float32)))
        bad = gt_one['boxes'].copy()
        bad[:, :2] += rng.normal(0, 1.5, (len(kept), 2))
        preds_bad.append(dict(boxes=bad, labels=gt_one['labels'],
                              scores=preds[-1]['scores']))
    classes = ['Pedestrian', 'Cyclist', 'Car']  # labels index this list
    out = kitti_eval(preds, gts, classes, metrics=('bev', '3d'))
    assert out['Car_3d_moderate_AP40'] > 90, out
    out_bad = kitti_eval(preds_bad, gts, classes, metrics=('3d',))
    assert out_bad['Car_3d_moderate_AP40'] < out['Car_3d_moderate_AP40']


def test_nuscenes_real_eval_gt_as_predictions():
    """Devkit-fidelity NDS on real annotations: GT as predictions →
    mAP ≈ 1, TP errors ≈ 0, NDS ≈ 1."""
    from tpu_bev3d.datasets import NuScenesDataset
    from tpu_bev3d.evaluation.functional.nuscenes_eval import nuscenes_eval
    ds = NuScenesDataset(data_root=DEMO_NUS, ann_file=NUS_DEMO_PKL,
                         use_valid_flag=True,
                         pipeline=[dict(type='LoadAnnotations3D')])
    ann = ds.get_data_info(0)['ann_info']
    classes = ds.classes
    keep = ann['gt_labels_3d'] >= 0
    boxes = ann['gt_bboxes_3d'][keep]
    labels = ann['gt_labels_3d'][keep]
    gt = [dict(boxes=boxes, labels=labels)]
    pred = [dict(boxes=boxes, labels=labels,
                 scores=np.linspace(0.99, 0.5, len(boxes))
                 .astype(np.float32))]
    out = nuscenes_eval(pred, gt, classes)
    assert out['mAP'] > 0.99, out['mAP']
    assert out['NDS'] > 0.9, out['NDS']
    # perturbed predictions must score strictly lower
    bad = boxes.copy()
    bad[:, :2] += np.random.default_rng(1).normal(0, 1.0, (len(bad), 2))
    out_bad = nuscenes_eval([dict(boxes=bad, labels=labels,
                                  scores=pred[0]['scores'])], gt, classes)
    assert out_bad['NDS'] < out['NDS']


def test_real_kitti_pipeline_into_model():
    """Real cloud → full train pipeline → Pack3DDetInputs → PointPillars
    loss + predict: finite losses, valid fixed-shape batch."""
    import jax
    import jax.numpy as jnp
    from tpu_bev3d.config import Config
    from tpu_bev3d.datasets import KittiDataset, DataLoader
    from tpu_bev3d.testing import build_detector_from_cfg

    pipeline = LOAD_K + [
        dict(type='GlobalRotScaleTrans', rot_range=[-0.1, 0.1],
             scale_ratio_range=[0.95, 1.05]),
        dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
        dict(type='PointsRangeFilter',
             point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
        dict(type='ObjectRangeFilter',
             point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
        dict(type='PointShuffle'),
        dict(type='Pack3DDetInputs', num_points=20000, max_gt=16),
    ]
    ds = KittiDataset(data_root=DEMO_KITTI, ann_file='000008.pkl',
                      pipeline=pipeline)
    b = next(iter(DataLoader(ds, batch_size=1)))
    assert b['points'].shape == (1, 20000, 4)
    assert b['gt_mask'].sum() == 6

    cfg = Config.fromfile('configs/pointpillars/pointpillars_kitti_3class.py')
    m = cfg.model
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 1024
    m.max_num_points = 16
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    m.middle_encoder.output_shape = [128, 112]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 8
    model = build_detector_from_cfg(m)
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k not in ('metainfo', 'lidar_aug')}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert all(np.isfinite(float(v)) for v in losses.values())
    preds = model.apply(variables, batch, mode='predict', train=False)
    assert np.isfinite(np.asarray(preds['bboxes'])).all()


def test_real_nuscenes_frame_through_flagship_tiny():
    """The headline integration: a REAL nuScenes frame (full cloud + 6
    real camera images + real calibration) through the L+C pipeline into
    the tiny flagship BEVFusion predict. Validates image loading/aug,
    calib stacking, lidar2img composition, and the fused predict path on
    real inputs end to end."""
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    from tpu_bev3d.datasets import NuScenesDataset, DataLoader
    from tpu_bev3d.testing import build_detector_from_cfg

    cfg = g._flagship_cfg(tiny=True)
    pipeline = [
        dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
        dict(type='BEVLoadMultiViewImageFromFiles', num_views=6),
        dict(type='ImageAug3D', final_dim=(64, 176),
             resize_lim=(0.11, 0.11), is_train=False),
        dict(type='PointsRangeFilter',
             point_cloud_range=[-54, -54, -5, 54, 54, 3]),
        dict(type='Pack3DDetInputs', num_points=40000, max_gt=80,
             box_dim=9),
    ]
    ds = NuScenesDataset(data_root=DEMO_NUS, ann_file=NUS_DEMO_PKL,
                         use_valid_flag=True,
                         modality=dict(use_lidar=True, use_camera=True),
                         pipeline=pipeline)
    b = next(iter(DataLoader(ds, batch_size=1)))
    assert b['imgs'].shape == (1, 6, 64, 176, 3)
    assert np.isfinite(b['imgs']).all()
    assert b['points_mask'].sum() > 30000
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != 'metainfo'}
    if 'lidar_aug' not in batch:
        batch['lidar_aug'] = jnp.tile(jnp.eye(4, dtype=jnp.float32),
                                      (1, 1, 1))
    model = build_detector_from_cfg(cfg.model)
    variables = jax.jit(
        lambda r, bb: model.init(r, bb, mode='tensor'))(
            jax.random.PRNGKey(0), batch)
    preds = model.apply(variables, batch, mode='predict', train=False)
    assert np.isfinite(np.asarray(preds['bboxes'])).all()
    assert np.isfinite(np.asarray(preds['scores'])).all()
    # real points project into the camera: the depth-supervision targets
    # derived from the real cloud+calib must put >100 pixels in range
    l2i = np.asarray(batch['lidar2img'])[0]
    pts = np.asarray(batch['points'])[0][np.asarray(batch['points_mask'])[0]]
    hom = np.concatenate([pts[:, :3], np.ones((len(pts), 1))], -1)
    cam = hom @ l2i[0].T
    uv = cam[:, :2] / np.maximum(cam[:, 2:3], 1e-5)
    vis = (cam[:, 2] > 1) & (uv[:, 0] >= 0) & (uv[:, 0] < 176) \
        & (uv[:, 1] >= 0) & (uv[:, 1] < 64)
    assert vis.sum() > 100


def test_visualizer_real_frame_render(tmp_path):
    """Headless BEV + image-projection render from the real KITTI demo
    frame (the VERDICT 'demo render from a real cloud' item)."""
    from tpu_bev3d.datasets import KittiDataset
    from tpu_bev3d.visualization import Det3DVisualizer
    ds = KittiDataset(data_root=DEMO_KITTI, ann_file='000008.pkl',
                      pipeline=LOAD_K)
    info = ds.get_data_info(0)
    s = ds.prepare_data(0)
    vis = Det3DVisualizer(classes=['Pedestrian', 'Cyclist', 'Car'])
    out = os.path.join(tmp_path, 'bev.png')
    vis.draw_bev(points=s['points'],
                 gt_bboxes=info['ann_info']['gt_bboxes_3d'],
                 out_file=out, pc_range=(0, -40, 70.4, 40))
    assert os.path.isfile(out) and os.path.getsize(out) > 1000


def test_add_datasample_real_frame(tmp_path):
    """The draw-everything entry (ref add_datasample:930) on the real
    KITTI frame: BEV + 3D views with GT boxes and noisy 'predictions',
    image projection, and a seg-mask render."""
    from tpu_bev3d.datasets import KittiDataset
    from tpu_bev3d.visualization import Det3DVisualizer
    ds = KittiDataset(data_root=DEMO_KITTI, ann_file='000008.pkl',
                      pipeline=LOAD_K)
    info = ds.get_data_info(0)
    s = ds.prepare_data(0)
    gb = info['ann_info']['gt_bboxes_3d']
    rng = np.random.default_rng(0)
    pb = gb + rng.normal(0, 0.2, gb.shape).astype(np.float32)
    vis = Det3DVisualizer(classes=['Pedestrian', 'Cyclist', 'Car'])
    from tpu_bev3d.datasets.transforms.image_transforms import _imread
    img = _imread(os.path.join(DEMO_KITTI, '000008.png'))
    l2i = np.asarray(
        pickle.load(open(os.path.join(DEMO_KITTI, '000008.pkl'), 'rb'))
        ['data_list'][0]['images']['CAM2']['lidar2img'], np.float32)
    files = vis.add_datasample(
        'frame8',
        dict(points=s['points'], img=img / 255.0, lidar2img=l2i),
        pred=dict(bboxes=pb, scores=np.full(len(pb), 0.9, np.float32),
                  labels=np.full(len(pb), 2)),
        gt=dict(gt_bboxes_3d=gb), out_dir=str(tmp_path))
    assert len(files) == 3
    for f in files:
        assert os.path.getsize(f) > 1000
    # seg task: color points by height-band pseudo labels
    seg = np.clip((s['points'][:, 2] + 3).astype(np.int64), 0, 4)
    files2 = vis.add_datasample(
        'frame8s', dict(points=s['points']),
        pred=dict(pts_semantic_mask=seg), out_dir=str(tmp_path),
        vis_task='lidar_seg')
    assert len(files2) == 2
    assert all(os.path.getsize(f) > 1000 for f in files2)


def test_update_infos_to_v2_on_real_v1_pkl(tmp_path):
    """The REAL v1-format mono pkl from the reference fixtures
    (kitti_infos_mono3d.pkl: list of image/point_cloud/calib/annos dicts)
    upgrades to the v2 metainfo+data_list schema and loads through
    KittiDataset."""
    from tools.update_infos_to_v2 import update_pkl_infos
    from tpu_bev3d.datasets import KittiDataset
    src = os.path.join(KITTI, 'kitti_infos_mono3d.pkl')
    out = os.path.join(tmp_path, 'v2.pkl')
    new = update_pkl_infos('kitti', src, out)
    assert 'data_list' in new and len(new['data_list']) == 1
    inst = new['data_list'][0]['instances']
    assert len(inst) >= 1
    # v1 annos are camera-frame label-file rows: (x, y, z, l, w?, h?, ry)
    # converted with lhw reorder — check the fields exist and are finite
    b = np.asarray(inst[0]['bbox_3d'])
    assert b.shape == (7,) and np.isfinite(b).all()
    assert 'bbox' in inst[0] and 'occluded' in inst[0]
    ds = KittiDataset(data_root=str(tmp_path), ann_file='v2.pkl',
                      pipeline=[dict(type='LoadAnnotations3D')])
    ann = ds.get_data_info(0)['ann_info']
    assert ann is not None and len(ann['gt_labels_3d']) == len(inst)


def test_waymo_real_info_pkl():
    """The reference's real Waymo fixture (kitti_format v2 infos with
    cam_sync_instances/cam_instances, 6-feature clouds) loads through
    WaymoDataset: paths resolve, LiDAR-frame boxes parse, cam-sync
    selection switches the instance source."""
    from tpu_bev3d.datasets import WaymoDataset
    root = os.path.join(DATA, 'waymo', 'kitti_format')
    pipe = [dict(type='LoadPointsFromFile', load_dim=6, use_dim=6),
            dict(type='LoadAnnotations3D')]
    ds = WaymoDataset(data_root=root, ann_file='waymo_infos_train.pkl',
                      data_prefix=dict(pts='training/velodyne'),
                      pipeline=pipe)
    assert len(ds) >= 1
    info = ds.get_data_info(0)
    assert os.path.isfile(info['lidar_path'])
    ann = info['ann_info']
    assert ann['gt_bboxes_3d'].shape[1] == 7
    assert set(np.unique(ann['gt_labels_3d'])) <= {0, 1, 2}
    assert 'num_lidar_pts' in ann and 'difficulty' in ann
    s = ds.prepare_data(0)
    assert s['points'].shape[1] == 6 and len(s['points']) > 100
    # cam-sync selection uses the other instance list
    ds2 = WaymoDataset(data_root=root, ann_file='waymo_infos_train.pkl',
                       data_prefix=dict(pts='training/velodyne'),
                       cam_sync_instances=True, pipeline=pipe)
    ann2 = ds2.get_data_info(0)['ann_info']
    assert ann2 is not None
    # min_lidar_pts filter
    ds3 = WaymoDataset(data_root=root, ann_file='waymo_infos_train.pkl',
                       data_prefix=dict(pts='training/velodyne'),
                       min_lidar_pts=100, pipeline=pipe)
    ann3 = ds3.get_data_info(0)['ann_info']
    if ann3 is not None:
        assert ann3['num_lidar_pts'].min() >= 100


def test_scannet_real_fixture_with_global_alignment():
    """Real ScanNet fixture: 6-dim gravity-centered yaw-free boxes parse
    to bottom-center 7-dim; the REAL axis_align_matrix drives
    GlobalAlignment; instance/semantic masks load and align."""
    from tpu_bev3d.datasets import ScanNetDataset
    root = os.path.join(DATA, 'scannet')
    pipe = [dict(type='LoadPointsFromFile', load_dim=6, use_dim=6),
            dict(type='LoadAnnotations3D'),
            dict(type='GlobalAlignment', rotation_axis=2)]
    ds = ScanNetDataset(data_root=root, ann_file='scannet_infos.pkl',
                        data_prefix=dict(pts='points',
                                         pts_semantic_mask='semantic_mask',
                                         pts_instance_mask='instance_mask'),
                        pipeline=pipe)
    info = ds.get_data_info(0)
    assert info['axis_align_matrix'].shape == (4, 4)
    ann = info['ann_info']
    assert ann['gt_bboxes_3d'].shape[1] == 7
    assert (ann['gt_bboxes_3d'][:, 6] == 0).all()  # yaw-free
    s = ds.prepare_data(0)
    assert s['points'].shape[1] == 6 and len(s['points']) >= 100
    assert os.path.isfile(info['pts_semantic_mask_path'])
    assert os.path.isfile(info['pts_instance_mask_path'])
    # seg variant provides the raw-id → train-id mapping
    from tpu_bev3d.datasets import ScanNetSegDataset
    seg = ScanNetSegDataset(data_root=root, ann_file='scannet_infos.pkl',
                            data_prefix=dict(pts='points'),
                            pipeline=[dict(type='LoadPointsFromFile',
                                           load_dim=6, use_dim=6)])
    m = seg.get_data_info(0)['seg_label_mapping']
    assert m[3] == 0 and m[39] == 17 and m[0] == 255


def test_sunrgbd_real_fixture():
    from tpu_bev3d.datasets import SUNRGBDDataset
    root = os.path.join(DATA, 'sunrgbd')
    ds = SUNRGBDDataset(data_root=root, ann_file='sunrgbd_infos.pkl',
                        data_prefix=dict(pts='points'),
                        pipeline=[dict(type='LoadPointsFromFile',
                                       load_dim=6, use_dim=6),
                                  dict(type='LoadAnnotations3D')])
    info = ds.get_data_info(0)
    ann = info['ann_info']
    assert ann['gt_bboxes_3d'].shape[1] == 7
    assert np.isfinite(ann['gt_bboxes_3d']).all()
    with open(os.path.join(root, 'sunrgbd_infos.pkl'), 'rb') as f:
        raw = pickle.load(f)['data_list'][0]['instances']
    if raw:
        # gravity → bottom shift applied
        exp_z = raw[0]['bbox_3d'][2] - raw[0]['bbox_3d'][5] / 2
        assert abs(ann['gt_bboxes_3d'][0, 2] - exp_z) < 1e-5


def test_semantickitti_real_fixture_seg_pipeline():
    """Real SemanticKITTI frame + .label file through the seg pipeline:
    labels decode (low 16 bits), align with points, and the seg-mask
    packing keeps the ignore contract."""
    from tpu_bev3d.datasets import SemanticKittiDataset
    root = os.path.join(DATA, 'semantickitti')
    pipe = [dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
            dict(type='LoadAnnotations3D', with_bbox_3d=False,
                 with_label_3d=False, with_seg_3d=True),
            dict(type='Pack3DDetInputs', num_points=8192, max_gt=1)]
    ds = SemanticKittiDataset(
        data_root=root, ann_file='semantickitti_infos.pkl',
        data_prefix=dict(pts='sequences/00/velodyne'), pipeline=pipe)
    info = ds.get_data_info(0)
    # mask path resolves next to the cloud
    assert info['pts_semantic_mask_path'].endswith('.label')
    s = ds.prepare_data(0)
    n = int(s['points_mask'].sum())
    assert n >= 50
    seg = s['pts_semantic_mask']
    assert seg.shape == (8192,)
    assert (seg[:n] != 255).any()


def test_lyft_converter_on_real_devkit_json():
    """The Lyft converter runs over the REAL v1.01 devkit JSON tables in
    the fixture and produces infos that load through LyftDataset."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..',
                                    'tools'))
    from lyft_converter import create_lyft_infos
    from tpu_bev3d.datasets import LyftDataset
    import tempfile
    # fixture nests the tables one level deeper than the standard
    # layout (root/v1.01-train/v1.01-train/*.json)
    root = os.path.join(DATA, 'lyft', 'v1.01-train')
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, 'infos.pkl')
        create_lyft_infos(root, version='v1.01-train', out_file=out)
        with open(out, 'rb') as f:
            d = pickle.load(f)
        assert len(d['data_list']) >= 1
        e = d['data_list'][0]
        assert e['instances'], 'real annotations expected'
        ds = LyftDataset(data_root=os.path.join(DATA, 'lyft'),
                         ann_file=out, data_prefix=dict(pts=''),
                         pipeline=[dict(type='LoadAnnotations3D')])
        ann = ds.get_data_info(0)['ann_info']
        assert ann is not None and len(ann['gt_labels_3d']) > 0
        assert np.isfinite(ann['gt_bboxes_3d']).all()


def test_votenet_on_real_scannet_fixture():
    """Indoor end-to-end on REAL data: the ScanNet fixture's real points
    + real gravity-converted GT through the reference pipeline
    (shift_height + GlobalAlignment with the real matrix + PointSample)
    into a tiny VoteNet — losses finite, predict finite."""
    import jax
    import jax.numpy as jnp
    from tpu_bev3d.config import Config
    from tpu_bev3d.datasets import ScanNetDataset, DataLoader
    from tpu_bev3d.testing import build_detector_from_cfg

    pipe = [
        dict(type='LoadPointsFromFile', coord_type='DEPTH',
             shift_height=True, load_dim=6, use_dim=[0, 1, 2]),
        dict(type='LoadAnnotations3D'),
        dict(type='GlobalAlignment', rotation_axis=2),
        dict(type='PointSample', num_points=128),
        dict(type='Pack3DDetInputs', num_points=128, max_gt=32),
    ]
    ds = ScanNetDataset(data_root=os.path.join(DATA, 'scannet'),
                        ann_file='scannet_infos.pkl',
                        data_prefix=dict(pts='points'), pipeline=pipe)
    b = next(iter(DataLoader(ds, batch_size=1)))
    assert b['points'].shape == (1, 128, 4)      # xyz + height channel
    assert b['gt_mask'].sum() > 0

    cfg = Config.fromfile('configs/votenet/votenet_scannet.py')
    m = cfg.model
    m.backbone.num_points = (64, 32, 16, 8)
    m.backbone.num_samples = (8, 8, 4, 4)
    m.backbone.sa_channels = ((16, 16), (16, 16), (16, 16), (16, 16))
    m.backbone.fp_channels = ((16, 16), (16, 16))
    m.bbox_head.in_channels = 16
    m.bbox_head.num_proposals = 8
    m.bbox_head.agg_channels = (16, 16)
    m.bbox_head.agg_num_sample = 4
    m.bbox_head.max_num = 8
    model = build_detector_from_cfg(m)
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != 'metainfo'}
    v = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses = model.apply(v, batch, mode='loss')
    for k, val in losses.items():
        assert np.isfinite(float(val)), (k, val)
    preds = model.apply(v, batch, mode='predict')
    assert np.isfinite(np.asarray(preds['bboxes'])).all()


def test_petr_on_real_nuscenes_frame():
    """Camera-only family on REAL data: the 6 real camera images + real
    calibration of the demo frame through the L+C pipeline into a tiny
    PETR — loss and predict finite with real GT."""
    import jax
    import jax.numpy as jnp
    from tpu_bev3d.config import Config
    from tpu_bev3d.datasets import NuScenesDataset, DataLoader
    from tpu_bev3d.testing import build_detector_from_cfg

    pipeline = [
        dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
        dict(type='BEVLoadMultiViewImageFromFiles', num_views=6),
        dict(type='ImageAug3D', final_dim=(64, 176),
             resize_lim=(0.11, 0.11), is_train=False),
        dict(type='LoadAnnotations3D'),
        dict(type='Pack3DDetInputs', num_points=1024, max_gt=64,
             box_dim=9),
    ]
    ds = NuScenesDataset(data_root=DEMO_NUS, ann_file=NUS_DEMO_PKL,
                         use_valid_flag=True,
                         modality=dict(use_lidar=True, use_camera=True),
                         pipeline=pipeline)
    b = next(iter(DataLoader(ds, batch_size=1)))
    cfg = Config.fromfile('configs/petr/petr_swin_nus.py')
    m = cfg.model
    m.image_size = [64, 176]
    m.img_backbone.embed_dims = 24
    m.img_backbone.num_heads = [2, 4, 8, 16]
    m.img_neck.in_channels = [48, 96, 192]
    m.img_neck.out_channels = 32
    m.bbox_head.in_channels = 32
    m.bbox_head.embed_dims = 32
    m.bbox_head.num_query = 32
    m.bbox_head.num_layers = 2
    m.bbox_head.depth_num = 8
    m.bbox_head.max_num = 16
    model = build_detector_from_cfg(m)
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != 'metainfo'}
    v = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(v, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, val in losses.items():
        assert np.isfinite(float(val)), (k, val)
    preds = model.apply(v, batch, mode='predict')
    assert np.isfinite(np.asarray(preds['bboxes'])).all()


def test_s3dis_real_fixture():
    from tpu_bev3d.datasets import S3DISDataset, S3DISSegDataset
    root = os.path.join(DATA, 's3dis')
    ds = S3DISDataset(data_root=root, ann_file='s3dis_infos.pkl',
                      data_prefix=dict(pts='points'),
                      pipeline=[dict(type='LoadAnnotations3D')])
    ann = ds.get_data_info(0)['ann_info']
    assert ann['gt_bboxes_3d'].shape[1] == 7
    seg = S3DISSegDataset(data_root=root, ann_file='s3dis_infos.pkl',
                          data_prefix=dict(pts='points'), pipeline=[])
    m = seg.get_data_info(0)['seg_label_mapping']
    assert m[7] == 0 and m[11] == 4 and m[1] == 255


def test_bench_real_batch_contract():
    """bench.py's real-frame input (__graft_entry__._make_real_batch)
    must produce the exact fixed-shape batch contract the flagship
    predict graph expects — guards the driver's bench path."""
    import __graft_entry__ as g

    cfg = g._flagship_cfg(tiny=False)
    b = g._make_real_batch(cfg, num_points=30000)
    assert b is not None, 'vendored demo fixture must load'
    assert b['points'].shape == (1, 30000, 5)
    assert b['imgs'].shape == (1, 6, 256, 704, 3)
    assert b['lidar2img'].shape == (1, 6, 4, 4)
    assert b['lidar_aug'].shape == (1, 4, 4)
    assert int(b['points_mask'].sum()) == 30000
    pts = np.asarray(b['points'])[0]
    assert np.isfinite(pts).all()
    # real cloud occupancy at faithful scale: the measured band the
    # single-sweep config capacities were sized from
    c = np.floor((pts[:, :3] - np.array([-54, -54, -5.]))
                 / np.array([0.075, 0.075, 0.2])).astype(np.int64)
    vox = np.unique(c, axis=0)
    assert 12000 < len(vox) < 36000
    tiles = np.unique(np.stack([c[:, 2] // 2, c[:, 1] // 4, c[:, 0] // 4],
                               1), axis=0)
    assert len(tiles) < 12288, 'single-sweep tile capacity must cover it'
