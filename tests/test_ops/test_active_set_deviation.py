"""Quantify the floor-rule active-set deviation vs the exact spconv rule
on a realistic (surface-clustered) cloud — VERDICT r2 #9.

The flat backend's floor rule produces a SUBSET of spconv's output sites
at strided convs (documented deviation, ops/sparse_conv.py:19-26). The
tile backend implements both; this test measures the miss rate per
downsample stage and pins the parity contract: every floor site is a
spconv site, and faithful configs (active_rule='spconv') have zero miss.
"""
import jax.numpy as jnp
import numpy as np

from tpu_bev3d.ops.sparse_conv import SparseTensor
from tpu_bev3d.ops.tile_sparse import (sparse_conv3d_tile, tiles_from_sparse,
                                       tiles_to_sparse)
from tpu_bev3d.testing.model_utils import lidar_scan_points


def _sites(tt):
    st = tiles_to_sparse(tt)
    c = np.asarray(st.coords)
    return {tuple(r) for r in c[c[:, 0] >= 0]}


def test_floor_vs_spconv_miss_rate():
    rng = np.random.default_rng(0)
    pts = lidar_scan_points(rng, 20000, (0, -40, -3, 70.4, 40, 1))
    shape = (41, 400, 352)          # 4x-coarser KITTI grid, CPU-sized
    vox = ((pts - np.array([0, -40, -3]))
           / np.array([0.2, 0.2, 0.1])).astype(np.int32)
    vox = vox[:, ::-1]              # (z, y, x)
    keep = ((vox >= 0) & (vox < np.asarray(shape))).all(1)
    vox = np.unique(vox[keep], axis=0)
    cap = 8192
    n = min(len(vox), cap)
    coords = np.full((cap, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1:] = vox[:n]
    feats = rng.standard_normal((cap, 4)).astype(np.float32)
    feats[n:] = 0
    st = SparseTensor(jnp.asarray(feats), jnp.asarray(coords), shape, 1)
    w = jnp.asarray(rng.standard_normal((27, 4, 8)).astype(np.float32))

    tt = tiles_from_sparse(st, (2, 4, 4), capacity=4096)
    rates = []
    for stage in range(2):
        out_floor = sparse_conv3d_tile(tt, w if stage == 0 else w8,
                                       stride=2, padding=1, rule='floor',
                                       out_capacity=4096)
        out_sp = sparse_conv3d_tile(tt, w if stage == 0 else w8,
                                    stride=2, padding=1, rule='spconv',
                                    out_capacity=4096)
        sf, ss = _sites(out_floor), _sites(out_sp)
        assert sf <= ss, 'floor sites must be a subset of spconv sites'
        miss = 1 - len(sf) / max(len(ss), 1)
        rates.append(miss)
        tt = out_sp
        w8 = jnp.asarray(np.random.default_rng(1).standard_normal(
            (27, 8, 8)).astype(np.float32))
    # on surface-clustered clouds the floor rule drops a sizable fraction
    # of spconv's dilated boundary sites — this is WHY faithful configs
    # now run active_rule='spconv' (zero deviation by construction)
    print(f'floor-vs-spconv miss rates per stage: '
          f'{[f"{r:.1%}" for r in rates]}')
    assert all(0 <= r < 0.9 for r in rates)
