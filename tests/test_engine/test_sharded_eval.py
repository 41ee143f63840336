"""Sharded multi-device evaluation (SURVEY §2.5: shard the val set,
pad+mask the tail batch, gather metric states; ref mmengine BaseMetric
per-rank process → rank-0 gather,
mmdet3d/evaluation/metrics/nuscenes_metric.py:125,149).

The val batches run mesh-sharded over 4 CPU devices with a short tail
batch (10 samples, batch 4 → 4/4/2+pad) and must accumulate EXACTLY the
per-sample results the plain single-device batch-1 loop produces.
"""
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope='module')
def mini_data(tmp_path_factory):
    root = tmp_path_factory.mktemp('sharded_eval_data')
    rng = np.random.default_rng(3)
    data_list = []
    os.makedirs(root / 'points', exist_ok=True)
    for i in range(10):
        pts = rng.uniform([0, -40, -3, 0], [70, 40, 1, 1],
                          (400, 4)).astype(np.float32)
        rel = f'points/{i:06d}.bin'
        pts.tofile(root / rel)
        instances = [dict(bbox_3d=[20.0 + 3 * j, -4.0 + 2 * j, -1.0,
                                   3.9, 1.6, 1.56, 0.1 * j],
                          bbox_label_3d=j % 3, num_lidar_pts=5)
                     for j in range(2)]
        data_list.append(dict(
            sample_idx=i,
            lidar_points=dict(lidar_path=rel, num_pts_feats=4),
            instances=instances))
    with open(root / 'infos.pkl', 'wb') as f:
        pickle.dump(dict(metainfo={}, data_list=data_list), f)
    return str(root)


class SpyMetric:
    """Records per-sample results like BaseMetric and reduces to sums, so
    sharded-vs-single comparison checks every accumulated sample."""

    def __init__(self):
        self.results = []

    def process(self, predictions, batch):
        from tpu_bev3d.evaluation.metrics.base_metric import BaseMetric
        BaseMetric.process(self, predictions, batch)

    def compute_metrics(self):
        return dict(
            n=float(len(self.results)),
            score_sum=float(sum(r[0]['scores'].sum()
                                for r in self.results)),
            box_abs_sum=float(sum(np.abs(r[0]['boxes']).sum()
                                  for r in self.results)))


def _tiny_cfg(mini_data, batch_size):
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
    return Config.fromdict(dict(
        model=m,
        train_cfg=dict(max_epochs=1, batch_size=batch_size,
                       optimizer=dict(type='adamw', lr=1e-4)),
        train_dataloader=dict(dataset=ds_cfg),
        test_dataloader=dict(dataset=dict(**ds_cfg, test_mode=False)),
        test_evaluator=dict(type='KittiMetric'),
        num_workers=0,
    ))


def test_sharded_eval_matches_single_device(mini_data, tmp_path):
    import optax
    from tpu_bev3d.datasets import DataLoader
    from tpu_bev3d.engine.runner import Runner
    from tpu_bev3d.engine.train_loop import make_eval_step
    from tpu_bev3d.engine.train_state import create_train_state

    cfg = _tiny_cfg(mini_data, batch_size=4)
    runner = Runner(cfg, work_dir=str(tmp_path / 'wd'))
    assert runner.mesh.size == 4  # gcd(4, 8 cpu devices)

    ds, loader = runner._build_loader(cfg.test_dataloader.dataset,
                                      shuffle=False, drop_last=False)
    assert len(loader) == 3  # 4 + 4 + 2(short tail)
    batch0 = runner._first_device_batch(loader)
    state = create_train_state(runner.model, batch0, optax.sgd(0.0))

    eval_fn = make_eval_step(runner.model, runner.mesh)
    out = runner._eval_batches(loader, eval_fn, state, SpyMetric())
    assert out['n'] == 10  # tail padding sliced off, nothing dropped

    # reference: plain single-device batch-1 loop, no padding
    ref_metric = SpyMetric()
    fn1 = make_eval_step(runner.model)
    loader1 = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    for hb in loader1:
        batch = {k: jnp.asarray(v) for k, v in hb.items()
                 if k != 'metainfo'}
        ref_metric.process(jax.device_get(fn1(state, batch)), hb)
    ref = ref_metric.compute_metrics()

    assert ref['n'] == 10
    np.testing.assert_allclose(out['score_sum'], ref['score_sum'],
                               rtol=1e-4)
    np.testing.assert_allclose(out['box_abs_sum'], ref['box_abs_sum'],
                               rtol=1e-4)


def test_runner_test_sharded_end_to_end(mini_data, tmp_path):
    """Runner.test() end-to-end over the mesh with the real KittiMetric
    and a short tail batch returns finite metrics."""
    from tpu_bev3d.engine.runner import Runner
    cfg = _tiny_cfg(mini_data, batch_size=4)
    runner = Runner(cfg, work_dir=str(tmp_path / 'wd'))
    out = runner.test()
    assert 'm3d_AP40' in out
