"""Demos, misc tools, model converters and the HTTP serving shim —
subprocess-level CI over tiny configs + synthetic fixtures.

Covers the reference surfaces demo/{pcd,mono_det,multi_modality,pcd_seg}
_demo.py, tools/misc/{browse_dataset,print_config,fuse_conv_bn,
visualize_results}.py, tools/model_converters/publish_model.py and
tools/deployment (tools/serve.py analogue) — each exercised end to end
the way a user would run it (ref: /root/reference/demo/,
/root/reference/tools/misc/, tools/deployment/mmdet3d_handler.py).
"""
import json
import os
import pickle
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
ENV = dict(os.environ, TPU_BEV3D_PLATFORM='cpu')


def _run(args, timeout=900, **kw):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, timeout=timeout, env=ENV, cwd=REPO,
                          **kw)


@pytest.fixture(scope='module')
def ws(tmp_path_factory):
    """Shared workspace: tiny KITTI-ish dataset + cloud + tiny configs."""
    root = tmp_path_factory.mktemp('demo_ws')
    rng = np.random.default_rng(0)

    # -- point cloud (dim 4) with a car-sized cluster
    pts = rng.uniform([0, -20, -2, 0], [40, 20, 1, 1],
                      (700, 4)).astype(np.float32)
    obj = rng.uniform([9, 1.5, -1.0, 0], [11, 2.5, 0.2, 1],
                      (60, 4)).astype(np.float32)
    cloud = np.concatenate([pts, obj])
    cloud.tofile(root / 'cloud.bin')

    # -- mini info pkl (2 frames) for browse_dataset / visualize_results
    os.makedirs(root / 'points', exist_ok=True)
    data_list = []
    for i in range(2):
        rel = f'points/{i:06d}.bin'
        cloud.tofile(root / rel)
        data_list.append(dict(
            sample_idx=i,
            lidar_points=dict(lidar_path=rel, num_pts_feats=4),
            instances=[dict(bbox_3d=[10.0, 2.0, -1.0, 3.9, 1.6, 1.56, 0.1],
                            bbox_label_3d=0, num_lidar_pts=30)]))
    with open(root / 'infos.pkl', 'wb') as f:
        pickle.dump(dict(metainfo={}, data_list=data_list), f)

    # -- tiny PointPillars config (detection demos, serve, publish, fuse)
    pp_cfg = root / 'pp_tiny.py'
    pp_cfg.write_text(f"""
_base_ = ['{REPO}/configs/pointpillars/pointpillars_kitti_3class.py']
model = dict(
    voxel_size=[0.64, 0.64, 4], max_voxels=256, max_num_points=8,
    voxel_encoder=dict(voxel_size=[0.64, 0.64, 4]),
    middle_encoder=dict(output_shape=[128, 112]),
    bbox_head=dict(nms_pre=64, max_num=8))
inference_num_points = 1024
_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
    dict(type='LoadAnnotations3D'),
    dict(type='PointsRangeFilter',
         point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
    dict(type='Pack3DDetInputs', num_points=512, max_gt=8),
]
_ds = dict(type='KittiDataset', data_root='{root}',
           ann_file='infos.pkl', pipeline=_pipeline)
train_dataloader = dict(dataset=_ds)
val_dataloader = dict(dataset=dict(**_ds, test_mode=False))
test_dataloader = dict(dataset=dict(**_ds, test_mode=False))
num_workers = 0
""")
    return root


@pytest.fixture(scope='module')
def pp_cfg(ws):
    return str(ws / 'pp_tiny.py')


def test_pcd_demo(ws, pp_cfg, tmp_path):
    r = _run([os.path.join(REPO, 'demo', 'pcd_demo.py'),
              str(ws / 'cloud.bin'), pp_cfg,
              '--out-dir', str(tmp_path), '--score-thr', '0.0',
              '--show'])  # no DISPLAY here: must fall back headless
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / 'bev.png').exists(), r.stdout[-1000:]
    assert (tmp_path / 'scene3d.png').exists(), r.stdout[-1000:]


def test_mono_det_demo(ws, tmp_path):
    cfg = tmp_path / 'smoke_tiny.py'
    cfg.write_text(f"""
_base_ = ['{REPO}/configs/smoke/smoke_kitti.py']
model = dict(
    img_backbone=dict(channels=(8, 8, 16, 16, 32, 32)),
    img_neck=dict(in_channels=[16, 16, 32, 32], out_channels=16),
    bbox_head=dict(in_channels=16, feat_channels=16, max_num=16))
test_pipeline = [
    dict(type='LoadImageFromFileMono3D'),
    dict(type='AffineResize', img_scale=(128, 96), down_ratio=4),
    dict(type='Pack3DDetInputs', max_gt=8),
]
test_dataloader = dict(dataset=dict(pipeline=test_pipeline))
""")
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    img = np.clip(np.random.default_rng(0).normal(
        0.5, 0.2, (96, 128, 3)), 0, 1).astype(np.float32)
    plt.imsave(tmp_path / 'img.png', img)
    with open(tmp_path / 'calib.json', 'w') as f:
        json.dump({'cam2img': [[320.0, 0.0, 64.0],
                               [0.0, 320.0, 48.0],
                               [0.0, 0.0, 1.0]]}, f)
    r = _run([os.path.join(REPO, 'demo', 'mono_det_demo.py'),
              str(tmp_path / 'img.png'), str(tmp_path / 'calib.json'),
              str(cfg), '--out-dir', str(tmp_path / 'out'),
              '--score-thr', '0.0'])
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / 'out' / 'mono_det.png').exists(), r.stdout[-1000:]


def test_pcd_seg_demo(ws, tmp_path):
    cfg = tmp_path / 'mink_tiny.py'
    cfg.write_text(f"""
_base_ = ['{REPO}/configs/minkunet/minkunet_semantickitti.py']
model = dict(
    voxel_size=[0.25, 0.25, 0.25],
    point_cloud_range=[-20, -20, -4, 20, 20, 4],
    max_voxels=4096,
    backbone=dict(base_channels=8, encoder_channels=[8, 8, 16, 16],
                  decoder_channels=[16, 8, 8, 8]))
inference_num_points = 768
""")
    r = _run([os.path.join(REPO, 'demo', 'pcd_seg_demo.py'),
              str(ws / 'cloud.bin'), str(cfg),
              '--out-dir', str(tmp_path / 'out')])
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / 'out' / 'seg.png').exists(), r.stdout[-1000:]


def test_multi_modality_demo(ws, tmp_path):
    cfg = tmp_path / 'fusion_tiny.py'
    cfg.write_text(f"""
_base_ = ['{REPO}/configs/bevfusion/bevfusion_lidar_cam_tpu_fast_nus.py']
model = dict(
    compute_dtype='float32', head_dtype='float32',
    voxel_size=[0.5625, 0.5625, 0.2], max_voxels=512,
    middle_encoder=dict(sparse_shape=[41, 192, 192],
                        voxel_size=[0.5625, 0.5625, 0.2]),
    bbox_head=dict(voxel_size=[0.5625, 0.5625, 0.2], num_proposals=32),
    view_transform=dict(image_size=[64, 176], feature_size=[8, 22],
                        xbound=[-54.0, 54.0, 2.25],
                        ybound=[-54.0, 54.0, 2.25],
                        dbound=[1.0, 25.0, 1.0]))
inference_num_points = 4096
""")
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    rng = np.random.default_rng(0)
    img_dir = tmp_path / 'imgs'
    os.makedirs(img_dir)
    cams = ['CAM_FRONT', 'CAM_FRONT_LEFT']
    images = {}
    for i, cam in enumerate(cams):
        im = np.clip(rng.normal(0.5, 0.2, (64, 176, 3)), 0,
                     1).astype(np.float32)
        plt.imsave(img_dir / f'{cam}.png', im)
        az = 0.6 * i
        c, s = np.cos(az), np.sin(az)
        cam2lidar = np.array([[s, 0, c, 0], [-c, 0, s, 0],
                              [0, -1, 0, 0], [0, 0, 0, 1]], np.float32)
        images[cam] = dict(
            cam2img=[[140.0, 0.0, 88.0], [0.0, 140.0, 32.0],
                     [0.0, 0.0, 1.0]],
            lidar2cam=np.linalg.inv(cam2lidar).tolist())
    cloud5 = rng.uniform([-40, -40, -3, 0, 0], [40, 40, 1, 1, 0],
                         (2000, 5)).astype(np.float32)
    cloud5.tofile(tmp_path / 'cloud5.bin')
    with open(tmp_path / 'infos.pkl', 'wb') as f:
        pickle.dump(dict(metainfo={},
                         data_list=[dict(images=images)]), f)
    r = _run([os.path.join(REPO, 'demo', 'multi_modality_demo.py'),
              str(tmp_path / 'cloud5.bin'), str(img_dir),
              str(tmp_path / 'infos.pkl'), str(cfg),
              '--out-dir', str(tmp_path / 'out'), '--score-thr', '0.0'])
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / 'out' / 'fused_bev.png').exists(), r.stdout[-1000:]
    assert (tmp_path / 'out' / 'proj_CAM_FRONT.png').exists()


def test_print_config(pp_cfg):
    r = _run([os.path.join(REPO, 'tools', 'misc', 'print_config.py'),
              pp_cfg], timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'Config read from' in r.stdout
    assert 'PointPillars' in r.stdout


def test_browse_dataset(pp_cfg, tmp_path):
    r = _run([os.path.join(REPO, 'tools', 'misc', 'browse_dataset.py'),
              pp_cfg, '--out-dir', str(tmp_path), '--num-samples', '2'],
             timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / 'sample_0.png').exists()
    assert (tmp_path / 'sample_1.png').exists()


def test_visualize_results(pp_cfg, tmp_path):
    results = [dict(bboxes=np.array([[10.0, 2.0, -1.0, 3.9, 1.6, 1.56,
                                      0.1]], np.float32),
                    scores=np.array([0.9], np.float32),
                    labels=np.array([0], np.int64))
               for _ in range(2)]
    with open(tmp_path / 'res.pkl', 'wb') as f:
        pickle.dump(results, f)
    r = _run([os.path.join(REPO, 'tools', 'misc', 'visualize_results.py'),
              pp_cfg, str(tmp_path / 'res.pkl'),
              '--out-dir', str(tmp_path / 'out'), '--num', '2'],
             timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / 'out' / 'frame_0.png').exists()


@pytest.fixture(scope='module')
def pp_ckpt(pp_cfg, tmp_path_factory):
    """A saved TrainState checkpoint for the tiny PointPillars (what
    init_model --checkpoint restores)."""
    wd = tmp_path_factory.mktemp('ckpt')
    import jax
    import jax.numpy as jnp
    from tpu_bev3d.apis import init_model
    from tpu_bev3d.engine.checkpoint import save_checkpoint
    from tpu_bev3d.engine.optim import build_optimizer
    from tpu_bev3d.engine.train_state import TrainState
    m = init_model(pp_cfg)
    tx, _ = build_optimizer({'type': 'adamw'}, 1)
    params = m.variables['params']
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=m.variables.get('batch_stats', {}),
                       opt_state=tx.init(params))
    path = save_checkpoint(str(wd), 0, jax.device_get(state))
    return path


def test_publish_model(pp_cfg, pp_ckpt, tmp_path):
    out_stem = str(tmp_path / 'pp_published')
    r = _run([os.path.join(REPO, 'tools', 'model_converters',
                           'publish_model.py'),
              pp_cfg, pp_ckpt, out_stem], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    zips = [f for f in os.listdir(tmp_path)
            if f.startswith('pp_published-') and f.endswith('.zip')]
    assert len(zips) == 1, (r.stdout, os.listdir(tmp_path))
    # sha digest suffix present (8 hex chars)
    digest = zips[0][len('pp_published-'):-len('.zip')]
    assert len(digest) == 8


def test_fuse_conv_bn_cli_and_equivalence(ws, pp_cfg, pp_ckpt, tmp_path):
    out_dir = str(tmp_path / 'fused')
    r = _run([os.path.join(REPO, 'tools', 'misc', 'fuse_conv_bn.py'),
              pp_cfg, pp_ckpt, out_dir], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'fused' in r.stdout
    n = int(r.stdout.split('fused ')[1].split(' ')[0])
    assert n > 0, r.stdout
    # inference equivalence: original vs fused checkpoint on one cloud
    from tpu_bev3d.apis import inference_detector, init_model
    m0 = init_model(pp_cfg, pp_ckpt)
    m1 = init_model(pp_cfg, os.path.join(out_dir, 'ckpt_0'))
    cloud = str(ws / 'cloud.bin')
    r0 = inference_detector(m0, cloud)[0]
    r1 = inference_detector(m1, cloud)[0]
    assert r0['bboxes'].shape == r1['bboxes'].shape
    np.testing.assert_allclose(r0['scores'], r1['scores'],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(r0['bboxes'], r1['bboxes'],
                               rtol=1e-4, atol=1e-4)


def test_serve_http(ws, pp_cfg):
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, 'tools', 'serve.py'),
         pp_cfg, '--port', str(port), '--score-thr', '0.0'],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=ENV, cwd=REPO)
    import urllib.request
    try:
        deadline = time.time() + 600
        ok = False
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    'server died: ' + proc.stderr.read().decode()[-3000:])
            try:
                with urllib.request.urlopen(
                        f'http://127.0.0.1:{port}/ping', timeout=5) as f:
                    ok = json.load(f).get('status') == 'Healthy'
                    break
            except Exception:
                time.sleep(2.0)
        assert ok, 'server never became healthy'
        body = (ws / 'cloud.bin').read_bytes()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predictions/pp', data=body,
            headers={'Content-Type': 'application/octet-stream'})
        with urllib.request.urlopen(req, timeout=300) as f:
            rows = json.load(f)
        assert isinstance(rows, list) and rows
        assert set(rows[0]) == {'3dbbox', 'score', 'label'}
        assert len(rows[0]['3dbbox']) == len(rows[0]['score'])
        # base64-JSON body variant (the TorchServe handler's other mode)
        import base64
        req2 = urllib.request.Request(
            f'http://127.0.0.1:{port}/predictions/pp',
            data=json.dumps(
                {'data': base64.b64encode(body).decode()}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req2, timeout=300) as f:
            rows2 = json.load(f)
        assert rows2[0]['score'] == rows[0]['score']
    finally:
        proc.kill()
        proc.wait()


def test_inference_demo_walkthrough(ws, pp_cfg, tmp_path):
    """demo/inference_demo.py — the scripted analogue of the reference's
    demo/inference_demo.ipynb."""
    r = _run([os.path.join(REPO, 'demo', 'inference_demo.py'),
              '--config', pp_cfg, '--pcd', str(ws / 'cloud.bin'),
              '--out-dir', str(tmp_path), '--score-thr', '0.0'])
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'step 5' in r.stdout
    assert (tmp_path / 'inference_demo_bev.png').exists()


def test_convert_legacy_checkpoints(tmp_path):
    """tools/model_converters/convert_legacy_checkpoints.py — votenet
    pre-v0.6 head split + regnet (pycls) renames (ref
    convert_votenet_checkpoints.py:96-146, regnet2mmdet.py)."""
    torch = pytest.importorskip('torch')
    C = 18
    sd = {
        'bbox_head.conv_pred.0.conv.weight': torch.randn(8, 8, 1),
        'bbox_head.conv_pred.0.bn.weight': torch.randn(8),
        'bbox_head.conv_pred.0.bn.num_batches_tracked':
            torch.zeros((), dtype=torch.long),
        'bbox_head.conv_pred.conv_out.weight': torch.randn(2 + 6 + C, 8, 1),
        'bbox_head.conv_pred.conv_out.bias': torch.randn(2 + 6 + C),
        'backbone.SA_modules.0.mlps.0.layer0.conv.weight':
            torch.randn(16, 4, 1, 1),
    }
    src = tmp_path / 'legacy.pth'
    torch.save({'state_dict': sd}, src)
    dst = tmp_path / 'modern.pth'
    r = _run([os.path.join(REPO, 'tools', 'model_converters',
                           'convert_legacy_checkpoints.py'),
              'votenet', str(src), str(dst), '--num-classes', str(C)])
    assert r.returncode == 0, r.stderr[-3000:]
    out = torch.load(dst, weights_only=False)['state_dict']
    assert 'bbox_head.conv_pred.shared_convs.layer0.conv.weight' in out
    assert not any(k.endswith('num_batches_tracked') for k in out)
    assert out['bbox_head.conv_pred.conv_cls.weight'].shape[0] == 2 + C
    assert out['bbox_head.conv_pred.conv_reg.weight'].shape[0] == 6
    w = sd['bbox_head.conv_pred.conv_out.weight']
    assert torch.equal(out['bbox_head.conv_pred.conv_cls.weight'][:2],
                       w[:2])
    assert torch.equal(out['bbox_head.conv_pred.conv_reg.weight'], w[2:-C])
    # regnet renames
    sd2 = {'stem.conv.weight': torch.randn(8, 3, 3, 3),
           'stem.bn.weight': torch.randn(8),
           's1.b1.proj.weight': torch.randn(8, 8, 1, 1),
           's1.b1.bn.weight': torch.randn(8),
           's1.b1.f.a.weight': torch.randn(8, 8, 1, 1),
           's1.b2.f.b_bn.running_mean': torch.randn(8),
           'head.fc.weight': torch.randn(10, 8)}
    src2 = tmp_path / 'regnet.pth'
    torch.save(sd2, src2)
    dst2 = tmp_path / 'regnet_mm.pth'
    r = _run([os.path.join(REPO, 'tools', 'model_converters',
                           'convert_legacy_checkpoints.py'),
              'regnet', str(src2), str(dst2)])
    assert r.returncode == 0, r.stderr[-3000:]
    out2 = torch.load(dst2, weights_only=False)['state_dict']
    assert {'conv1.weight', 'bn1.weight', 'layer1.0.downsample.0.weight',
            'layer1.0.downsample.1.weight', 'layer1.0.conv1.weight',
            'layer1.1.bn2.running_mean', 'fc.weight'} <= set(out2)
