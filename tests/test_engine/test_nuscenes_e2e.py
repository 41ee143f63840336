"""Full-loop integration: devkit-free nuScenes converter → NuScenesDataset
→ Runner test loop → native NuScenesMetric. Closes the data-tooling →
eval chain end to end."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..', 'tools'))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', 'test_tools'))


def test_nuscenes_end_to_end(tmp_path):
    from test_nuscenes_converter import _make_mini_nuscenes
    from nuscenes_converter import create_nuscenes_infos
    from tpu_bev3d.config import Config
    from tpu_bev3d.engine.runner import Runner

    _make_mini_nuscenes(tmp_path)
    info = create_nuscenes_infos(str(tmp_path), 'v1.0-mini')

    base = Config.fromfile(
        'configs/centerpoint/centerpoint_voxel01_second_secfpn_nus.py')
    m = base.model
    m.voxel_size = [0.8, 0.8, 0.2]
    m.max_voxels = 512
    m.max_num_points = 5
    m.middle_encoder.sparse_shape = [41, 128, 128]
    m.bbox_head.voxel_size = [0.8, 0.8]
    m.bbox_head.grid_size = [128, 128]
    m.bbox_head.max_objs = 8
    m.bbox_head.post_max_size = 8

    pipeline = [
        dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
        dict(type='LoadAnnotations3D'),
        dict(type='PointsRangeFilter',
             point_cloud_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]),
        dict(type='Pack3DDetInputs', num_points=512, max_gt=8, box_dim=9),
    ]
    cfg = Config.fromdict(dict(
        model=m,
        train_cfg=dict(max_epochs=1, batch_size=1,
                       optimizer=dict(type='adamw', lr=1e-4)),
        test_dataloader=dict(dataset=dict(
            type='NuScenesDataset', data_root=str(tmp_path),
            ann_file=os.path.basename(info), pipeline=pipeline,
            filter_empty_gt=False)),
        test_evaluator=dict(type='NuScenesMetric'),
        num_workers=0,
    ))
    runner = Runner(cfg, work_dir=str(tmp_path / 'wd'))
    out = runner.test()
    assert 'NDS' in out and 'mAP' in out
    assert np.isfinite(out['NDS'])
