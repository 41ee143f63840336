"""Dataset + transform pipeline over a synthetic mini dataset (pattern from
ref tests/test_datasets — miniature real datasets under tests/data)."""
import os
import pickle

import numpy as np
import pytest

from tpu_bev3d.datasets import (CBGSDataset, DataLoader, KittiDataset,
                                collate_batch)


@pytest.fixture(scope='module')
def mini_kitti(tmp_path_factory):
    """3-frame synthetic KITTI-format dataset: bin files + info pkl."""
    root = tmp_path_factory.mktemp('mini_kitti')
    rng = np.random.default_rng(0)
    data_list = []
    for i in range(3):
        pts = rng.uniform([0, -40, -3, 0], [70, 40, 1, 1],
                          (500, 4)).astype(np.float32)
        rel = f'points/{i:06d}.bin'
        os.makedirs(root / 'points', exist_ok=True)
        pts.tofile(root / rel)
        instances = []
        for j in range(4):
            instances.append(dict(
                bbox_3d=[10.0 + 5 * j, -5.0 + 3 * j, -1.0, 3.9, 1.6, 1.56,
                         0.3 * j],
                bbox_label_3d=j % 3,
                num_lidar_pts=10))
        data_list.append(dict(
            sample_idx=i,
            lidar_points=dict(lidar_path=rel, num_pts_feats=4),
            instances=instances))
    with open(root / 'infos.pkl', 'wb') as f:
        pickle.dump(dict(metainfo={}, data_list=data_list), f)
    return str(root)


PIPELINE = [
    dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
    dict(type='LoadAnnotations3D'),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.5, 0.5],
         scale_ratio_range=[0.95, 1.05]),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='PointsRangeFilter',
         point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
    dict(type='ObjectRangeFilter',
         point_cloud_range=[0, -40, -3, 70.4, 40, 1]),
    dict(type='PointShuffle'),
    dict(type='Pack3DDetInputs', num_points=1024, max_gt=16),
]


def test_dataset_pipeline_and_loader(mini_kitti):
    ds = KittiDataset(data_root=mini_kitti, ann_file='infos.pkl',
                      pipeline=PIPELINE)
    assert len(ds) == 3
    s = ds[0]
    assert s['points'].shape == (1024, 4)
    assert s['points_mask'].dtype == bool
    assert s['gt_bboxes_3d'].shape[0] == 16
    assert s['gt_mask'].sum() > 0

    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batches = list(dl)
    assert len(batches) == 1
    b = batches[0]
    assert b['points'].shape == (2, 1024, 4)
    assert b['gt_bboxes_3d'].shape == (2, 16, 7)
    # aug matrix recorded
    assert b['lidar_aug'].shape == (2, 4, 4)


def test_cbgs_wrapper(mini_kitti):
    ds = KittiDataset(data_root=mini_kitti, ann_file='infos.pkl',
                      pipeline=PIPELINE)
    cbgs = CBGSDataset(ds)
    assert len(cbgs) > 0
    s = cbgs[0]
    assert s['points'].shape == (1024, 4)


def test_model_consumes_loader_batch(mini_kitti):
    import jax
    import jax.numpy as jnp
    from tpu_bev3d.config import Config
    from tpu_bev3d.testing import build_detector_from_cfg

    cfg = Config.fromfile('configs/pointpillars/pointpillars_kitti_3class.py')
    m = cfg.model
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 256
    m.max_num_points = 8
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    m.middle_encoder.output_shape = [128, 112]
    m.bbox_head.nms_pre = 64
    m.bbox_head.max_num = 8
    model = build_detector_from_cfg(m)

    ds = KittiDataset(data_root=mini_kitti, ann_file='infos.pkl',
                      pipeline=PIPELINE)
    b = next(iter(DataLoader(ds, batch_size=2)))
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k not in ('metainfo', 'lidar_aug')}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_object_noise_moves_boxes_and_points():
    """ObjectNoise jitters each box (collision-free) and carries the
    box's interior points along with it."""
    import numpy as np
    from tpu_bev3d.registry import TRANSFORMS

    t = TRANSFORMS.get('ObjectNoise')(
        translation_std=(1.0, 1.0, 0.0), rot_range=(-0.5, 0.5), seed=3)
    boxes = np.array([[0, 0, 0, 4, 2, 1.5, 0.0],
                      [20, 20, 0, 4, 2, 1.5, 0.5]], np.float32)
    # points inside box 0 and far background points
    inside = np.concatenate(
        [np.random.default_rng(0).uniform(-1, 1, (50, 2)) * [1.5, 0.8],
         np.full((50, 1), 0.5), np.ones((50, 1))], -1).astype(np.float32)
    bg = np.full((20, 4), 40.0, np.float32)
    pts = np.concatenate([inside, bg], 0)
    r = t(dict(gt_bboxes_3d=boxes.copy(),
               gt_labels_3d=np.zeros(2, np.int64), points=pts.copy()))
    nb = r['gt_bboxes_3d']
    assert not np.allclose(nb, boxes)             # noise applied
    assert np.allclose(nb[:, 3:6], boxes[:, 3:6])  # sizes unchanged
    # background untouched; interior points moved with the box
    np.testing.assert_array_equal(r['points'][50:], bg)
    delta_box = nb[0, :3] - boxes[0, :3]
    if np.abs(delta_box).max() > 1e-6:
        assert not np.allclose(r['points'][:50], pts[:50])
    # boxes still collision-free
    from tpu_bev3d.datasets.transforms.dbsampler import _bev_collision
    assert not _bev_collision(nb[:1, :7], nb[1:, :7]).any()
