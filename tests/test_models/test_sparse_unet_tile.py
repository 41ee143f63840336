"""SparseUNet tile backend (Part-A2's middle encoder, VERDICT r5):
flat-vs-tile exactness at model level — the tile relayout must reproduce
the flat gather-GEMM UNet bit-for-bit-ish (fp tolerance) on both the BEV
spatial features and the per-voxel seg features."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bev3d.registry import MODELS
import tpu_bev3d.models  # noqa: F401


def _mk_inputs(rng, V=220, C=4, shape=(33, 32, 32), B=2, cap=256):
    coords = set()
    while len(coords) < V:
        b = rng.integers(0, B)
        z, y, x = (rng.integers(0, s) for s in shape)
        coords.add((b, z, y, x))
    coords = np.array(sorted(coords), np.int32)
    feats = rng.standard_normal((V, C)).astype(np.float32)
    fp = np.zeros((cap, C), np.float32); fp[:V] = feats
    cp = np.full((cap, 4), -1, np.int32); cp[:V] = coords
    return jnp.asarray(fp), jnp.asarray(cp)


def _unet_cfg(backend):
    cfg = dict(type='SparseUNet', in_channels=4, sparse_shape=(33, 32, 32),
               base_channels=8,
               encoder_channels=((8,), (16, 16, 16), (16, 16, 16),
                                 (16, 16, 16)),
               encoder_paddings=((1,), (1, 1, 1), (1, 1, 1),
                                 ((0, 1, 1), 1, 1)),
               decoder_channels=((16, 16, 16), (16, 16, 16),
                                 (16, 16, 8), (8, 8, 8)),
               decoder_paddings=((1, 0), (1, 0), (0, 0), (0, 1)),
               output_channels=24)
    if backend == 'tile':
        cfg.update(backend='tile', tile_shape=(2, 4, 4),
                   tile_capacities=[128, 96, 64, 48])
    return cfg


def test_sparse_unet_tile_matches_flat():
    rng = np.random.default_rng(0)
    feats, coords = _mk_inputs(rng)
    flat = MODELS.build(_unet_cfg('flat'))
    tile = MODELS.build(_unet_cfg('tile'))
    vf = flat.init(jax.random.PRNGKey(0), feats, coords, 2)
    out_f = flat.apply(vf, feats, coords, 2)
    out_t = tile.apply(vf, feats, coords, 2)   # SAME params
    np.testing.assert_allclose(np.asarray(out_t['spatial_features']),
                               np.asarray(out_f['spatial_features']),
                               rtol=2e-4, atol=2e-4)
    # seg rows: tile returns original voxel-row order; flat's decoder
    # output is on the input coord table (same order) — compare directly
    sf = np.asarray(out_f['seg_features'])
    st_ = np.asarray(out_t['seg_features'])
    valid = np.asarray(coords)[:, 0] >= 0
    np.testing.assert_allclose(st_[valid], sf[valid], rtol=2e-4,
                               atol=2e-4)


def test_parta2_tile_backend_end_to_end():
    """Part-A2 with the tile UNet: loss + predict run and are finite."""
    from tpu_bev3d.config import Config
    from tpu_bev3d.testing import (build_detector_from_cfg,
                                   create_detector_inputs)
    cfg = Config.fromfile('configs/parta2/parta2_kitti_3class.py')
    m = cfg.model
    m.point_cloud_range = [0, -16, -3, 32, 16, 1]
    m.voxel_size = [0.5, 0.5, 0.1]
    m.max_voxels = 512
    m.middle_encoder.sparse_shape = [41, 64, 64]
    m.middle_encoder.backend = 'tile'
    m.middle_encoder.tile_shape = (2, 4, 4)
    m.middle_encoder.tile_capacities = [512, 384, 256, 128]
    model = build_detector_from_cfg(m)
    batch = create_detector_inputs(batch_size=1, num_points=600, num_gt=3,
                                   num_classes=3,
                                   pc_range=tuple(m.point_cloud_range))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses = model.apply(variables, batch, mode='loss')
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
