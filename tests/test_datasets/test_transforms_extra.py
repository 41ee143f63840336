"""Behavior tests for the 14 round-2 transforms (VERDICT r1 item 6).

Each test checks the documented reference semantics
(mmdet3d/datasets/transforms/transforms_3d.py, lines cited in the
implementations)."""
import numpy as np
import pytest

import tpu_bev3d.datasets  # noqa: F401 — populate the registry
from tpu_bev3d.registry import TRANSFORMS


def _r(seed=0):
    return {'_rng': np.random.default_rng(seed)}


def _mono_sample(seed=0, h=96, w=128, n=4):
    rng = np.random.default_rng(seed)
    res = _r(seed)
    res['img'] = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    res['gt_bboxes'] = np.array(
        [[10, 20, 50, 60], [30, 10, 90, 80], [60, 40, 120, 90],
         [5, 5, 20, 30]], np.float32)[:n]
    res['centers_2d'] = (res['gt_bboxes'][:, :2]
                         + res['gt_bboxes'][:, 2:]) / 2
    res['depths'] = np.linspace(5, 30, n).astype(np.float32)
    res['gt_bboxes_labels'] = np.arange(n)
    res['gt_bboxes_3d'] = rng.normal(0, 1, (n, 7)).astype(np.float32)
    res['gt_labels_3d'] = np.arange(n)
    res['cam2img'] = np.array([[700., 0, 64, 0], [0, 700., 48, 0],
                               [0, 0, 1, 0], [0, 0, 0, 1.]], np.float32)
    return res


def test_affine_resize_identity_like():
    """Without shift/scale, AffineResize maps image center to target
    center and scales boxes by target/source ratio."""
    t = TRANSFORMS.build(dict(type='AffineResize', img_scale=(256, 192),
                              down_ratio=4))
    res = t(_mono_sample())
    assert res['img'].shape == (192, 256, 3)
    assert res['trans_mat'].shape == (3, 3)
    # pure uniform scale (width-driven): sx == sy == 256/128
    M = res['trans_mat'] * 4  # down_ratio folds into the matrix
    c2d = res['centers_2d']
    assert len(c2d) >= 3
    assert np.all((c2d[:, 0] > 0) & (c2d[:, 0] < 256))
    # filtered annotation arrays stay aligned
    assert len(res['gt_bboxes']) == len(c2d) == len(res['depths'])


def test_random_shift_scale_records_center_size():
    t = TRANSFORMS.build(dict(type='RandomShiftScale',
                              shift_scale=(0.2, 0.4), aug_prob=1.0))
    res = t(_mono_sample())
    assert res['affine_aug'] is True
    assert res['center'].shape == (2,) and res['size'].shape == (2,)
    t0 = TRANSFORMS.build(dict(type='RandomShiftScale',
                               shift_scale=(0.2, 0.4), aug_prob=0.0))
    res0 = t0(_mono_sample())
    assert res0['affine_aug'] is False
    np.testing.assert_allclose(res0['center'], [64, 48])


def test_resize3d_scales_cam2img():
    t = TRANSFORMS.build(dict(type='Resize3D', scale=(256, 192),
                              keep_ratio=False))
    res = t(_mono_sample())
    assert res['img'].shape[:2] == (192, 256)
    # fx scaled by 2 (128→256), fy by 2 (96→192)
    np.testing.assert_allclose(res['cam2img'][0, 0], 1400.0)
    np.testing.assert_allclose(res['cam2img'][1, 1], 1400.0)
    np.testing.assert_allclose(res['centers_2d'][0],
                               [(10 + 50) / 2 * 2, (20 + 60) / 2 * 2])


def test_random_resize3d_respects_preset_scale():
    t = TRANSFORMS.build(dict(type='RandomResize3D', scale=(128, 96),
                              ratio_range=(0.5, 2.0), keep_ratio=False))
    res = _mono_sample()
    res['scale'] = (64, 48)     # preset wins (multi-view consistency)
    out = t(res)
    assert out['img'].shape[:2] == (48, 64)


def test_random_crop3d_shifts_principal_point():
    t = TRANSFORMS.build(dict(type='RandomCrop3D', crop_size=(64, 96),
                              allow_negative_crop=True))
    res = _mono_sample()
    fx0, cx0 = res['cam2img'][0, 0], res['cam2img'][0, 2]
    out = t(res)
    assert out['img'].shape[:2] == (64, 96)
    ow, oh = out['img_crop_offset']
    np.testing.assert_allclose(out['cam2img'][0, 2], cx0 - ow, atol=1e-4)
    np.testing.assert_allclose(out['cam2img'][0, 0], fx0, atol=1e-4)
    # reusing the recorded offset reproduces the same crop
    res2 = _mono_sample()
    res2['crop_size'] = out['crop_size']
    res2['img_crop_offset'] = out['img_crop_offset']
    out2 = t(res2)
    np.testing.assert_array_equal(out['img'], out2['img'])


def test_photometric_distortion_reusable_param():
    t = TRANSFORMS.build(dict(type='PhotoMetricDistortion3D'))
    res = t(_mono_sample(seed=3))
    assert 'photometric_param' in res
    res2 = _mono_sample(seed=99)
    res2['img'] = _mono_sample(seed=3)['img']
    res2['photometric_param'] = res['photometric_param']
    out2 = t(res2)
    np.testing.assert_allclose(res['img'], out2['img'])


def test_multiview_wrapper_shares_randomness():
    t = TRANSFORMS.build(dict(
        type='MultiViewWrapper',
        transforms=[dict(type='RandomResize3D', scale=(128, 96),
                         ratio_range=(0.5, 1.5), keep_ratio=False)]))
    rng = np.random.default_rng(0)
    res = _r(1)
    res['imgs_raw'] = [rng.uniform(0, 255, (96, 128, 3)).astype(np.float32)
                       for _ in range(3)]
    res['cam2img'] = [np.eye(4, dtype=np.float32) * [[700], [700], [1], [1]]
                      for _ in range(3)]
    out = t(res)
    shapes = [im.shape for im in out['imgs_raw']]
    assert len(set(shapes)) == 1         # same sampled scale for all views
    assert len(out['scale_factor']) == 3


def test_global_alignment():
    t = TRANSFORMS.build(dict(type='GlobalAlignment', rotation_axis=2))
    th = 0.3
    m = np.eye(4, dtype=np.float32)
    m[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    m[:3, 3] = [1.0, -2.0, 0.5]
    res = _r()
    res['points'] = np.array([[1, 0, 0, 9]], np.float32)
    res['axis_align_matrix'] = m
    out = t(res)
    exp = m[:3, :3] @ np.array([1, 0, 0]) + m[:3, 3]
    np.testing.assert_allclose(out['points'][0, :3], exp, atol=1e-6)
    assert out['points'][0, 3] == 9


def test_random_jitter_points_clipped():
    t = TRANSFORMS.build(dict(type='RandomJitterPoints', jitter_std=0.5,
                              clip_range=[-0.05, 0.05]))
    res = _r()
    res['points'] = np.zeros((1000, 4), np.float32)
    out = t(res)
    d = out['points'][:, :3]
    assert np.abs(d).max() <= 0.05 + 1e-6
    assert np.abs(d).max() > 0.01


def test_random_drop_points_color():
    t = TRANSFORMS.build(dict(type='RandomDropPointsColor', drop_ratio=1.0))
    res = _r()
    res['points'] = np.ones((10, 6), np.float32)
    out = t(res)
    assert np.all(out['points'][:, 3:6] == 0)
    assert np.all(out['points'][:, :3] == 1)


def test_background_points_filter():
    t = TRANSFORMS.build(dict(type='BackgroundPointsFilter',
                              bbox_enlarge_range=0.5))
    res = _r()
    # box at origin 2x2x2 (bottom z=-1); shell point at x=1.2 (inside
    # enlarged, outside box) must be dropped; inside + far points kept
    res['points'] = np.array([[0, 0, 0, 1], [1.2, 0, 0, 1],
                              [5, 5, 0, 1]], np.float32)
    res['gt_bboxes_3d'] = np.array([[0, 0, -1, 2, 2, 2, 0]], np.float32)
    res['pts_semantic_mask'] = np.arange(3)
    out = t(res)
    assert len(out['points']) == 2
    np.testing.assert_array_equal(out['pts_semantic_mask'], [0, 2])


def test_voxel_based_point_sampler():
    t = TRANSFORMS.build(dict(
        type='VoxelBasedPointSampler',
        cur_sweep_cfg=dict(voxel_size=[0.5, 0.5, 2], max_num_points=1,
                           point_cloud_range=[0, 0, -2, 8, 8, 2],
                           max_voxels=64),
        time_dim=3))
    rng = np.random.default_rng(0)
    res = _r()
    pts = rng.uniform([0, 0, -2, 0], [8, 8, 2, 0], (500, 4)) \
        .astype(np.float32)
    res['points'] = pts
    res['pts_semantic_mask'] = np.arange(500).astype(np.int64)
    out = t(res)
    assert out['points'].shape == (64, 4)
    assert out['pts_semantic_mask'].shape == (64,)
    # each kept point carries its own (not shuffled-off) semantic id
    i = int(out['pts_semantic_mask'][0])
    np.testing.assert_allclose(out['points'][0], pts[i])


def test_indoor_patch_point_sample():
    t = TRANSFORMS.build(dict(type='IndoorPatchPointSample', num_points=256,
                              block_size=1.5, ignore_index=255,
                              use_normalized_coord=True))
    rng = np.random.default_rng(0)
    res = _r()
    res['points'] = rng.uniform(0, 5, (3000, 6)).astype(np.float32)
    res['pts_semantic_mask'] = rng.integers(0, 20, 3000)
    out = t(res)
    assert out['points'].shape == (256, 9)   # +3 normalized coords
    assert out['pts_semantic_mask'].shape == (256,)
    # xy centered around the sampled patch center
    assert np.abs(out['points'][:, :2]).max() < 1.5 / 2 + 0.2 + 0.1


class _FakeSegDataset:
    def __init__(self, seed=5):
        rng = np.random.default_rng(seed)
        self.pts = rng.uniform(-10, 10, (2000, 4)).astype(np.float32)
        self.sem = rng.integers(0, 5, 2000).astype(np.int64)

    def __len__(self):
        return 4

    def get_data_info(self, idx):
        return dict(points=self.pts.copy(),
                    pts_semantic_mask=self.sem.copy())


def test_polar_mix():
    t = TRANSFORMS.build(dict(type='PolarMix', instance_classes=[1, 2],
                              swap_ratio=1.0, rotate_paste_ratio=1.0,
                              prob=1.0))
    ds = _FakeSegDataset()
    res = _r(1)
    res['points'] = np.random.default_rng(2).uniform(
        -10, 10, (1500, 4)).astype(np.float32)
    res['pts_semantic_mask'] = np.zeros(1500, np.int64)
    res['dataset'] = ds
    out = t(res)
    assert len(out['points']) == len(out['pts_semantic_mask'])
    # pasted instances bring classes 1/2 in
    assert set(np.unique(out['pts_semantic_mask'])) >= {0, 1, 2}


def test_laser_mix_partitions_by_pitch():
    t = TRANSFORMS.build(dict(type='LaserMix', num_areas=[3],
                              pitch_angles=[-25, 3], prob=1.0))
    ds = _FakeSegDataset()
    res = _r(1)
    rng = np.random.default_rng(3)
    res['points'] = rng.uniform(-10, 10, (1500, 4)).astype(np.float32)
    res['pts_semantic_mask'] = np.full(1500, 7, np.int64)
    res['dataset'] = ds
    out = t(res)
    assert len(out['points']) == len(out['pts_semantic_mask'])
    # mixture contains both sources
    assert (out['pts_semantic_mask'] == 7).any()
    assert (out['pts_semantic_mask'] != 7).any()


def test_mono_pipeline_on_real_kitti_frame():
    """The SMOKE/MonoFlex input recipe (LoadImageFromFileMono3D →
    RandomShiftScale → AffineResize → Pack) on the REAL demo KITTI frame:
    the real 1242×375 image affine-resizes to 384×1280, camera-frame GT
    and centers_2d stay aligned, and packing yields the mono batch
    contract (imgs/cam2img/gt_bboxes_3d/gt_mask)."""
    import os
    from tpu_bev3d.datasets import KittiDataset
    root = os.path.join(os.path.dirname(__file__), '..', 'data', 'demo',
                        'kitti')
    pipe = [
        dict(type='LoadImageFromFileMono3D'),
        dict(type='RandomShiftScale', shift_scale=(0.2, 0.4), aug_prob=1.0),
        dict(type='AffineResize', img_scale=(1280, 384), down_ratio=4),
        dict(type='Pack3DDetInputs', max_gt=16),
    ]
    from tpu_bev3d.datasets.det3d_dataset import compose
    ds = KittiDataset(data_root=root, ann_file='000008.pkl',
                      modality=dict(use_lidar=False, use_camera=True),
                      pipeline=[])
    info = ds.get_data_info(0)
    info['_rng'] = np.random.default_rng(3)   # deterministic aug draw
    s = compose(pipe)(info)
    assert s['imgs'].shape == (384, 1280, 3)
    assert np.isfinite(s['imgs']).all()
    assert s['gt_bboxes_3d'].shape == (16, 7)
    n = int(s['gt_mask'].sum())
    assert n >= 3                 # most of the 6 cars survive the aug crop
    # camera-frame boxes: z (depth) positive
    assert np.all(s['gt_bboxes_3d'][:n, 2] > 0)
    assert s['gt_bboxes'].shape == (16, 4)
    assert s['centers_2d'].shape == (16, 2)
    c = s['centers_2d'][:n]
    assert np.all((c[:, 0] >= 0) & (c[:, 0] <= 1280))
    assert s['depths'][:n].min() > 0
    assert s['trans_mat'].shape == (3, 3)
