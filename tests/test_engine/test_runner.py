"""End-to-end Runner: config-driven train (1 epoch) + checkpoint + test
loop with metric — the mmengine-Runner-equivalent surface."""
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope='module')
def mini_data(tmp_path_factory):
    root = tmp_path_factory.mktemp('runner_data')
    rng = np.random.default_rng(0)
    data_list = []
    os.makedirs(root / 'points', exist_ok=True)
    for i in range(4):
        pts = rng.uniform([0, -40, -3, 0], [70, 40, 1, 1],
                          (400, 4)).astype(np.float32)
        rel = f'points/{i:06d}.bin'
        pts.tofile(root / rel)
        instances = [dict(bbox_3d=[20.0 + 3 * j, -4.0 + 2 * j, -1.0,
                                   3.9, 1.6, 1.56, 0.1 * j],
                          bbox_label_3d=j % 3, num_lidar_pts=5)
                     for j in range(3)]
        data_list.append(dict(
            sample_idx=i,
            lidar_points=dict(lidar_path=rel, num_pts_feats=4),
            instances=instances))
    with open(root / 'infos.pkl', 'wb') as f:
        pickle.dump(dict(metainfo={}, data_list=data_list), f)
    return str(root)


def test_runner_train_and_test(mini_data, tmp_path):
    from tpu_bev3d.config import Config

    pipeline = [
        dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
        dict(type='LoadAnnotations3D'),
        dict(type='PointsRangeFilter',
             point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
        dict(type='Pack3DDetInputs', num_points=512, max_gt=8),
    ]
    base = Config.fromfile(
        'configs/pointpillars/pointpillars_kitti_3class.py')
    m = base.model
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 256
    m.max_num_points = 8
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    m.middle_encoder.output_shape = [128, 112]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 8

    ds_cfg = dict(type='KittiDataset', data_root=mini_data,
                  ann_file='infos.pkl', pipeline=pipeline)
    cfg = Config.fromdict(dict(
        model=m,
        train_cfg=dict(max_epochs=1, batch_size=2,
                       optimizer=dict(type='adamw', lr=1e-4),
                       scheduler=dict(type='const'),
                       clip_grad_norm=35.0),
        train_dataloader=dict(dataset=ds_cfg),
        test_dataloader=dict(dataset=dict(**ds_cfg, test_mode=False)),
        test_evaluator=dict(type='KittiMetric'),
        custom_hooks=[dict(type='Det3DVisualizationHook')],
        num_workers=0,
        log_interval=1,
    ))
    from tpu_bev3d.engine.runner import Runner
    runner = Runner(cfg, work_dir=str(tmp_path / 'wd'))
    state = runner.train()
    assert int(np.asarray(state.step)) == 2  # 4 samples / bs2 * 1 epoch
    # checkpoint written
    ckpts = [d for d in os.listdir(tmp_path / 'wd')
             if d.startswith('ckpt_')]
    assert ckpts
    # visualization hook rendered a val-sample BEV
    assert os.path.exists(tmp_path / 'wd' / 'vis' / 'epoch1.png')
    out = runner.test()
    assert 'm3d_AP40' in out


def test_visualization_hook_renders(tmp_path):
    """Det3DVisualizationHook writes a BEV PNG from runner val state."""
    import numpy as np
    from tpu_bev3d.engine.hooks import Det3DVisualizationHook

    class FakeRunner:
        pass

    r = FakeRunner()
    rng = np.random.default_rng(0)
    r.last_val_batch = dict(
        points=rng.normal(size=(1, 64, 5)).astype(np.float32) * 10,
        points_mask=np.ones((1, 64), bool),
        gt_bboxes_3d=np.asarray([[[1, 2, 0, 4, 2, 1.5, 0.3]]], np.float32),
        gt_mask=np.ones((1, 1), bool))
    r.last_val_preds = dict(
        bboxes=np.asarray([[[0, 0, 0, 4, 2, 1.5, 0.0],
                            [5, 5, 0, 2, 1, 1.0, 1.0]]], np.float32),
        scores=np.asarray([[0.9, 0.1]], np.float32),
        labels=np.asarray([[0, 1]], np.int32))
    hook = Det3DVisualizationHook(str(tmp_path), interval_epochs=1)
    hook.after_epoch(r, 0)
    import os
    assert os.path.exists(os.path.join(str(tmp_path), 'vis',
                                       'epoch1.png'))
