"""DataBaseSampler: collision-checked GT-paste with min-points filters;
DisableObjectSampleHook closure plumbing."""
import os
import pickle

import numpy as np


def _make_db(root):
    os.makedirs(root / 'gt_database', exist_ok=True)
    db = {'Car': []}
    rng = np.random.default_rng(0)
    for i in range(8):
        pts = rng.normal(0, 0.5, (30, 4)).astype(np.float32)
        rel = f'gt_database/car_{i}.bin'
        pts.tofile(root / rel)
        db['Car'].append(dict(
            name='Car', path=rel,
            box3d_lidar=np.array([5.0 + 4 * i, 0, -1, 3.9, 1.6, 1.56, 0.0],
                                 np.float32),
            num_points_in_gt=30, difficulty=0, num_features=4))
    # one too-sparse entry that the min-points filter must drop
    db['Car'].append(dict(
        name='Car', path=rel, box3d_lidar=np.zeros(7, np.float32),
        num_points_in_gt=2, difficulty=0, num_features=4))
    p = root / 'dbinfos.pkl'
    with open(p, 'wb') as f:
        pickle.dump(db, f)
    return str(p)


def test_dbsampler_sample_and_collision(tmp_path):
    from tpu_bev3d.datasets.transforms.dbsampler import DataBaseSampler
    info = _make_db(tmp_path)
    s = DataBaseSampler(
        info_path=info, data_root=str(tmp_path), rate=1.0,
        prepare=dict(filter_by_min_points=dict(Car=5)),
        sample_groups=dict(Car=4), classes=['Car'])
    # min-points filter applied
    assert all(i['num_points_in_gt'] >= 5 for i in s.db_infos['Car'])
    # existing GT at (5, 0): sampled boxes must not collide with it
    gt = np.array([[5.0, 0, -1, 3.9, 1.6, 1.56, 0.0]], np.float32)
    out = s.sample_all(gt, np.array([0]), ['Car'])
    assert out is not None
    boxes = out['gt_bboxes_3d']
    assert len(boxes) >= 1
    from tpu_bev3d.datasets.transforms.dbsampler import _bev_collision
    assert not _bev_collision(boxes[:, :7], gt[:, :7]).any()
    # sampled points shifted to their boxes
    assert len(out['points']) > 0


def test_disable_object_sample_hook():
    from tpu_bev3d.datasets.det3d_dataset import compose
    from tpu_bev3d.engine.hooks import DisableObjectSampleHook

    class FakeObjectSample:
        disabled = False

        def __call__(self, r):
            return r

    FakeObjectSample.__name__ = 'ObjectSample'
    t = FakeObjectSample()
    pipeline = compose([t])

    class R:
        pass

    r = R()
    r.train_dataset = R()
    r.train_dataset.pipeline = pipeline
    h = DisableObjectSampleHook(disable_after_epoch=2)
    h.before_epoch(r, 1)
    assert t.disabled is False
    h.before_epoch(r, 2)
    assert t.disabled is True
