"""Dense voxel encoder: contract parity with the sparse encoder and the
space-to-depth packed scatter."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.registry import MODELS
from tpu_bev3d.testing import (build_detector_from_cfg,
                               create_multimodal_inputs)


def test_space_to_depth_scatter_roundtrip():
    from tpu_bev3d.models.middle_encoders.dense_encoder import \
        scatter_space_to_depth
    rng = np.random.default_rng(0)
    V, C = 64, 5
    coords = np.concatenate(
        [np.zeros((V, 1), np.int32),
         rng.integers(0, [8, 16, 16], (V, 3))], -1).astype(np.int32)
    coords[50:] = -1
    feats = rng.normal(size=(V, C)).astype(np.float32)
    out = np.asarray(scatter_space_to_depth(
        jnp.asarray(feats), jnp.asarray(coords), batch_size=1, nz=8,
        ny=16, nx=16))
    assert out.shape == (1, 4, 8, 8, 8 * C)
    # check one voxel landed in the right channel block (xy-order layout:
    # [B, dz, dx, dy, 8C], sub = z%2*4 + x%2*2 + y%2)
    z, y, x = coords[0, 1:]
    sub = (z % 2) * 4 + (x % 2) * 2 + (y % 2)
    block = out[0, z // 2, x // 2, y // 2, sub * C:(sub + 1) * C]
    # may have collisions (add); at least the contribution is present
    assert np.all(np.abs(block) > 0) or np.allclose(block, feats[0])


def test_bevfusion_dense_config():
    cfg = Config.fromfile(
        'configs/bevfusion/bevfusion_lidar_cam_dense_nus.py')
    m = cfg.model
    assert m.middle_encoder.type == 'DenseVoxelEncoder'
    # tiny shapes
    m.voxel_size = [0.5625, 0.5625, 0.2]
    m.max_voxels = 512
    m.middle_encoder.sparse_shape = [41, 192, 192]
    m.middle_encoder.base_channels = 8
    m.middle_encoder.stage_channels = [16, 32]
    m.middle_encoder.output_channels = 32
    m.bbox_head.voxel_size = [0.5625, 0.5625, 0.2]
    m.bbox_head.num_proposals = 16
    m.bbox_head.in_channels = 512
    m.view_transform.image_size = [64, 176]
    m.view_transform.feature_size = [8, 22]
    m.view_transform.xbound = [-54.0, 54.0, 2.25]
    m.view_transform.ybound = [-54.0, 54.0, 2.25]
    m.view_transform.dbound = [1.0, 25.0, 1.0]
    # dense encoder emits 2*32=64ch BEV at 24² — adapt the BEV backbone
    m.backbone.in_channels = 64
    m.fuser.out_channels = 64
    model = build_detector_from_cfg(m)
    batch = create_multimodal_inputs(batch_size=1, num_points=256,
                                     image_size=(64, 176))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    preds = model.apply(variables, batch, mode='predict')
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
