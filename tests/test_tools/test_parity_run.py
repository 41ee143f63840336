"""tools/parity_run.py end to end (VERDICT r4 item 3): synthetic torch
checkpoints with the REAL reference state-dict layouts → convert →
(sharded) eval over vendored/mini datasets → delta table + exit code.
One subprocess per family: SECOND (mini-KITTI), CenterPoint (real
nuScenes demo frame), BEVFusion L+C (real 6-cam nuScenes demo frame)."""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DEMO_NUS = os.path.join(REPO, 'tests', 'data', 'demo', 'nuscenes')
NUS_PKL = 'n015-2018-07-24-11-22-45+0800.pkl'


def _run(cfg_path, pth, *extra):
    env = dict(os.environ, TPU_BEV3D_PLATFORM='cpu')
    return subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'parity_run.py'),
         str(cfg_path), str(pth), *extra],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)


def _json_line(stdout):
    for ln in stdout.splitlines():
        if ln.startswith('{') and '"metrics"' in ln:
            return json.loads(ln)
    raise AssertionError(f'no JSON line in output:\n{stdout[-2000:]}')


def _mini_kitti(root, n=3):
    rng = np.random.default_rng(0)
    os.makedirs(root / 'points')
    data_list = []
    for i in range(n):
        pts = rng.uniform([0, -20, -3, 0], [45, 20, 1, 1],
                          (400, 4)).astype(np.float32)
        rel = f'points/{i:06d}.bin'
        pts.tofile(root / rel)
        data_list.append(dict(
            sample_idx=i,
            lidar_points=dict(lidar_path=rel, num_pts_feats=4),
            instances=[dict(bbox_3d=[15.0 + 3 * j, -4.0 + 2 * j, -1.0,
                                     3.9, 1.6, 1.56, 0.1 * j],
                            bbox_label_3d=j % 3, num_lidar_pts=5)
                       for j in range(3)]))
    with open(root / 'infos.pkl', 'wb') as f:
        pickle.dump(dict(metainfo={}, data_list=data_list), f)


def _randomize_bn(tm):
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                                torch.nn.BatchNorm3d)):
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.normal_(0.2, 0.2)
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)


def test_parity_run_second_mini_kitti(tmp_path):
    from tests.torch_refs.zoo_refs import SECONDE2ERef
    from tpu_bev3d.config import Config
    me = Config.fromfile(os.path.join(
        REPO, 'configs/second/second_kitti_3class.py')).model.middle_encoder
    torch.manual_seed(0)
    tm = SECONDE2ERef(
        middle_kw=dict(in_channels=4, sparse_shape=(25, 48, 48),
                       base_channels=16, output_channels=128,
                       encoder_channels=tuple(me.encoder_channels),
                       encoder_paddings=tuple(me.encoder_paddings),
                       active_rule='spconv'),
        second_kw=dict(in_channels=128, out_channels=(32, 64),
                       layer_nums=(2, 2), layer_strides=(1, 2)),
        secfpn_kw=dict(in_channels=(32, 64), out_channels=(48, 48),
                       upsample_strides=(1, 2)),
        head_kw=dict(in_ch=96, num_anchors=6, num_classes=3)).eval()
    _randomize_bn(tm)
    pth = tmp_path / 'second.pth'
    torch.save(tm.state_dict(), pth)

    _mini_kitti(tmp_path / 'data')
    cfg_path = tmp_path / 'cfg.py'
    cfg_path.write_text(f"""
_base_ = ['{REPO}/configs/second/second_kitti_3class.py']
model = dict(
    point_cloud_range=[0.0, -24.0, -3.0, 48.0, 24.0, 1.0],
    voxel_size=[1.0, 1.0, 4.0 / 24], max_voxels=512, max_num_points=5,
    middle_encoder=dict(sparse_shape=[25, 48, 48], tile_capacity=2048,
                        tile_dtype=''),
    backbone=dict(in_channels=128, layer_nums=[2, 2],
                  out_channels=[32, 64]),
    neck=dict(in_channels=[32, 64], out_channels=[48, 48]),
    bbox_head=dict(in_channels=96, feat_channels=96, nms_pre=64,
                   max_num=8))
_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
    dict(type='LoadAnnotations3D'),
    dict(type='PointsRangeFilter',
         point_cloud_range=[0.0, -24.0, -3.0, 48.0, 24.0, 1.0]),
    dict(type='Pack3DDetInputs', num_points=512, max_gt=8),
]
train_cfg = dict(max_epochs=1, batch_size=1,
                 optimizer=dict(type='adamw', lr=1e-4))
test_dataloader = dict(dataset=dict(
    type='KittiDataset', data_root='{tmp_path / "data"}',
    ann_file='infos.pkl', pipeline=_pipeline, test_mode=False))
test_evaluator = dict(type='KittiMetric')
num_workers = 0
""")
    # plumbing pass: huge tol → exit 0, table + JSON emitted
    r = _run(cfg_path, pth, '--expected', 'm3d_AP40=0.0',
             '--tol', '999')
    assert r.returncode == 0, r.stderr[-3000:]
    out = _json_line(r.stdout)
    assert out['parity'] is True
    assert 'm3d_AP40' in out['metrics'] or out['metrics'], out
    assert 'delta' in r.stdout and 'reference' in r.stdout

    # delta gate: impossible expectation + tiny tol → exit 1
    r2 = _run(cfg_path, pth, '--expected', 'm3d_AP40=0.99',
              '--tol', '0.001')
    assert r2.returncode == 1, r2.stdout[-1500:]
    assert 'FAIL' in r2.stdout


NUS_PIPE = """[
    dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
    dict(type='LoadAnnotations3D'),
    dict(type='PointsRangeFilter',
         point_cloud_range=[-24.0, -24.0, -5.0, 24.0, 24.0, 3.0]),
    dict(type='Pack3DDetInputs', num_points=40000, max_gt=80, box_dim=9),
]"""


def test_parity_run_centerpoint_nus_demo(tmp_path):
    from tests.torch_refs.zoo_refs import CenterPointE2ERef
    torch.manual_seed(0)
    tasks = [dict(num_class=1, class_names=['car']),
             dict(num_class=2, class_names=['pedestrian', 'traffic_cone'])]
    common = {'reg': (2, 2), 'height': (1, 2), 'dim': (3, 2),
              'rot': (2, 2), 'vel': (2, 2)}
    tm = CenterPointE2ERef(
        middle_kw=dict(in_channels=5, sparse_shape=(25, 48, 48),
                       base_channels=16, output_channels=128,
                       active_rule='spconv'),
        second_kw=dict(in_channels=128, out_channels=(32, 64),
                       layer_nums=(2, 2), layer_strides=(1, 2)),
        secfpn_kw=dict(in_channels=(32, 64), out_channels=(48, 48),
                       upsample_strides=(1, 2)),
        head_kw=dict(in_ch=96, tasks=tasks, common_heads=common,
                     share_conv_channel=64)).eval()
    _randomize_bn(tm)
    pth = tmp_path / 'centerpoint.pth'
    torch.save(tm.state_dict(), pth)

    cfg_path = tmp_path / 'cfg.py'
    cfg_path.write_text(f"""
_base_ = ['{REPO}/configs/centerpoint/centerpoint_voxel01_second_secfpn_nus.py']
model = dict(
    point_cloud_range=[-24.0, -24.0, -5.0, 24.0, 24.0, 3.0],
    voxel_size=[1.0, 1.0, 8.0 / 24], max_voxels=512, max_num_points=10,
    middle_encoder=dict(sparse_shape=[25, 48, 48], tile_capacity=2048,
                        tile_dtype=''),
    backbone=dict(in_channels=128, layer_nums=[2, 2],
                  out_channels=[32, 64], layer_strides=[1, 2]),
    neck=dict(in_channels=[32, 64], out_channels=[48, 48],
              upsample_strides=[1, 2]),
    bbox_head=dict(
        tasks=[dict(num_class=1, class_names=['car']),
               dict(num_class=2, class_names=['pedestrian',
                                              'traffic_cone'])],
        in_channels=96, grid_size=[48, 48], post_max_size=16,
        min_radius_by_task=[4, 1], voxel_size=[1.0, 1.0, 8.0 / 24],
        point_cloud_range=[-24.0, -24.0, -5.0, 24.0, 24.0, 3.0]))
_pipeline = {NUS_PIPE}
train_cfg = dict(max_epochs=1, batch_size=1,
                 optimizer=dict(type='adamw', lr=1e-4))
test_dataloader = dict(dataset=dict(
    type='NuScenesDataset', data_root='{DEMO_NUS}',
    ann_file='{NUS_PKL}', use_valid_flag=True,
    pipeline=_pipeline, test_mode=False))
test_evaluator = dict(type='NuScenesMetric')
num_workers = 0
""")
    r = _run(cfg_path, pth, '--expected', 'NDS=0.0', 'mAP=0.0',
             '--tol', '999')
    assert r.returncode == 0, r.stderr[-3000:]
    out = _json_line(r.stdout)
    assert out['parity'] is True
    assert 'NDS' in out['metrics'] and 'mAP' in out['metrics']


def test_parity_run_bevfusion_lc_nus_demo(tmp_path):
    from tests.torch_refs.bevfusion_ref import BEVFusionE2ERef
    torch.manual_seed(0)
    tm = BEVFusionE2ERef(
        swin_kw=dict(embed_dims=32, depths=(2, 2, 6, 2),
                     num_heads=(2, 4, 8, 16), window_size=7,
                     out_indices=(1, 2, 3)),
        fpn_kw=dict(in_channels=(64, 128, 256), out_channels=64),
        lss_kw=dict(in_channels=64, out_channels=16, image_size=(64, 176),
                    feature_size=(8, 22), xbound=(-54.0, 54.0, 4.5),
                    ybound=(-54.0, 54.0, 4.5), zbound=(-10.0, 10.0, 20.0),
                    dbound=(1.0, 25.0, 1.0), downsample=2),
        middle_kw=dict(in_channels=5, sparse_shape=(25, 96, 96),
                       base_channels=16, output_channels=128,
                       active_rule='spconv'),
        fuser_in=16 + 128, fuser_out=64,
        second_kw=dict(in_channels=64, out_channels=(32, 64),
                       layer_nums=(2, 2), layer_strides=(1, 2)),
        secfpn_kw=dict(in_channels=(32, 64), out_channels=(48, 48),
                       upsample_strides=(1, 2)),
        head_kw=dict(num_classes=10, in_channels=96, hidden=32,
                     num_proposals=16,
                     heads={'center': (2, 2), 'height': (1, 2),
                            'dim': (3, 2), 'rot': (2, 2), 'vel': (2, 2),
                            'heatmap': (10, 2)},
                     num_heads=2, ff=64)).eval()
    _randomize_bn(tm)
    pth = tmp_path / 'bevfusion.pth'
    torch.save(tm.state_dict(), pth)

    cfg_path = tmp_path / 'cfg.py'
    cfg_path.write_text(f"""
_base_ = ['{REPO}/configs/bevfusion/'
          'bevfusion_lidar_cam_voxel0075_second_secfpn_nus.py']
model = dict(
    voxel_size=[1.125, 1.125, 0.32], max_num_points=10, max_voxels=600,
    img_backbone=dict(embed_dims=32, num_heads=[2, 4, 8, 16]),
    img_neck=dict(in_channels=[64, 128, 256], out_channels=64),
    middle_encoder=dict(sparse_shape=[25, 96, 96], tile_dtype=''),
    view_transform=dict(in_channels=64, out_channels=16,
                        image_size=[64, 176], feature_size=[8, 22],
                        xbound=[-54.0, 54.0, 4.5],
                        ybound=[-54.0, 54.0, 4.5],
                        dbound=[1.0, 25.0, 1.0], depth_topk=0),
    fuser=dict(out_channels=64),
    backbone=dict(in_channels=64, out_channels=[32, 64],
                  layer_nums=[2, 2]),
    neck=dict(in_channels=[32, 64], out_channels=[48, 48]),
    bbox_head=dict(in_channels=96, hidden_channel=32, num_proposals=16,
                   num_heads=2, ffn_channel=64,
                   voxel_size=[1.125, 1.125, 0.32]),
    compute_dtype='float32', head_dtype='float32')
_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
    dict(type='LoadAnnotations3D'),
    dict(type='BEVLoadMultiViewImageFromFiles', num_views=6),
    dict(type='ImageAug3D', final_dim=(64, 176),
         resize_lim=(0.11, 0.11), is_train=False),
    dict(type='PointsRangeFilter',
         point_cloud_range=[-54, -54, -5, 54, 54, 3]),
    dict(type='Pack3DDetInputs', num_points=40000, max_gt=80, box_dim=9),
]
train_cfg = dict(max_epochs=1, batch_size=1,
                 optimizer=dict(type='adamw', lr=1e-4))
test_dataloader = dict(dataset=dict(
    type='NuScenesDataset', data_root='{DEMO_NUS}',
    ann_file='{NUS_PKL}', use_valid_flag=True,
    modality=dict(use_lidar=True, use_camera=True),
    pipeline=_pipeline, test_mode=False))
test_evaluator = dict(type='NuScenesMetric')
num_workers = 0
""")
    r = _run(cfg_path, pth, '--expected', 'NDS=0.0', 'mAP=0.0',
             '--tol', '999')
    assert r.returncode == 0, r.stderr[-3000:]
    out = _json_line(r.stdout)
    assert out['parity'] is True
    assert 'NDS' in out['metrics'] and 'mAP' in out['metrics']
