"""tools/dist_train.sh NPROCS=2 — TRUE multi-process launch (two OS
processes, jax.distributed rendezvous on localhost, 1 CPU device each):
the TPU-pod analogue of the reference's tools/dist_train.sh
(torch.distributed.launch). Covers: init_distributed env forwarding,
per-host loader striping, make_array_from_process_local_data batch
placement, collective-synced sharded eval, cross-host metric gather,
and multi-process orbax checkpointing."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


@pytest.fixture
def mini_root(tmp_path):
    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / 'points')
    data_list = []
    for i in range(6):
        pts = rng.uniform([0, -40, -3, 0], [70, 40, 1, 1],
                          (400, 4)).astype(np.float32)
        rel = f'points/{i:06d}.bin'
        pts.tofile(tmp_path / rel)
        data_list.append(dict(
            sample_idx=i,
            lidar_points=dict(lidar_path=rel, num_pts_feats=4),
            instances=[dict(bbox_3d=[20.0 + 3 * j, -4.0 + 2 * j, -1.0,
                                     3.9, 1.6, 1.56, 0.1 * j],
                            bbox_label_3d=j % 3, num_lidar_pts=5)
                       for j in range(3)]))
    with open(tmp_path / 'infos.pkl', 'wb') as f:
        pickle.dump(dict(metainfo={}, data_list=data_list), f)
    return tmp_path


def test_dist_train_two_processes(mini_root, tmp_path):
    cfg_path = tmp_path / 'cfg.py'
    # 6 samples / 2 hosts -> train stripe 3, batch 2 per host (1 step,
    # 1 sample dropped per host: equalized-stripe drop_last semantics);
    # val stripes 3+3 with batch 2 -> a padded tail batch on both hosts
    cfg_path.write_text(f"""
_base_ = ['{REPO}/configs/pointpillars/pointpillars_kitti_3class.py']
model = dict(
    voxel_size=[0.64, 0.64, 4], max_voxels=256, max_num_points=8,
    voxel_encoder=dict(voxel_size=[0.64, 0.64, 4]),
    middle_encoder=dict(output_shape=[128, 112]),
    bbox_head=dict(nms_pre=64, max_num=8))
train_cfg = dict(max_epochs=1, batch_size=2, val_interval=1,
                 optimizer=dict(type='adamw', lr=1e-4),
                 scheduler=dict(type='const'), clip_grad_norm=35.0)
_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
    dict(type='LoadAnnotations3D'),
    dict(type='PointsRangeFilter',
         point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
    dict(type='Pack3DDetInputs', num_points=512, max_gt=8),
]
_ds = dict(type='KittiDataset', data_root='{mini_root}',
           ann_file='infos.pkl', pipeline=_pipeline)
train_dataloader = dict(dataset=_ds)
val_dataloader = dict(dataset=dict(**_ds, test_mode=False))
test_dataloader = dict(dataset=dict(**_ds, test_mode=False))
test_evaluator = dict(type='KittiMetric')
num_workers = 0
log_interval = 1
""")
    wd = str(tmp_path / 'wd')
    env = dict(os.environ, TPU_BEV3D_PLATFORM='cpu', NPROCS='2',
               PORT='12417',
               JAX_COMPILATION_CACHE_DIR=os.path.join(
                   REPO, 'tests', '.jax_cache_cpu'))
    r = subprocess.run(
        ['bash', os.path.join(REPO, 'tools', 'dist_train.sh'),
         str(cfg_path), '--work-dir', wd],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
    assert any(d.startswith('ckpt_') for d in os.listdir(wd)), \
        os.listdir(wd)
    # sharded in-training validation ran across both processes
    assert '[val] epoch 0' in r.stdout, r.stdout[-2000:]
