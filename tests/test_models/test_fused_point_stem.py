"""Sort-free fused point→canvas path ≡ hard_voxelize(mean) + fused stem."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_bev3d.registry import MODELS
import tpu_bev3d.models  # noqa: F401
from tpu_bev3d.ops.voxelize import batch_hard_voxelize


def _enc(fused_stem=True, point_path='countgrid'):
    return MODELS.build(dict(
        type='BEVColumnEncoder', in_channels=5,
        sparse_shape=[4, 16, 16], fused_stem=fused_stem, pack_xy=2,
        stem_channels=8, stage_channels=[8], stage_strides=[1],
        output_channels=8, point_path=point_path,
        voxel_size=[0.5, 0.5, 1.0],
        point_cloud_range=[-4, -4, -2, 4, 4, 2]))


def test_fused_point_scatter_matches_voxelized_path():
    rng = np.random.default_rng(0)
    B, P = 2, 300
    pts = rng.uniform(-4, 4, (B, P, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 2, (B, P))
    # quantize xy so several points share voxels (mean is exercised)
    pts[..., :2] = np.round(pts[..., :2] * 2) / 2 + 0.1
    mask = rng.uniform(size=(B, P)) > 0.1

    enc = _enc()
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    variables = enc.init(jax.random.PRNGKey(0), points=pts_j,
                         points_mask=mask_j)

    out_pts, _ = enc.apply(variables, points=pts_j, points_mask=mask_j,
                           mutable=['batch_stats'])

    vox = batch_hard_voxelize(
        pts_j, mask_j, voxel_size=(0.5, 0.5, 1.0),
        pc_range=(-4, -4, -2, 4, 4, 2), max_points=64,
        max_voxels_per_sample=P, reduce='mean')
    out_vox, _ = enc.apply(variables, vox['voxels'], vox['coords'], B,
                           mutable=['batch_stats'])

    assert out_pts.shape == out_vox.shape == (B, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(out_pts), np.asarray(out_vox),
                               rtol=2e-5, atol=2e-5)


def test_fused_point_scatter_drops_out_of_range():
    enc = _enc()
    pts = jnp.asarray(np.full((1, 10, 5), 100.0, np.float32))
    mask = jnp.ones((1, 10), bool)
    variables = enc.init(jax.random.PRNGKey(0), points=pts,
                         points_mask=mask)
    out, _ = enc.apply(variables, points=pts, points_mask=mask,
                       mutable=['batch_stats'])
    assert np.all(np.isfinite(np.asarray(out)))


def test_sorted_point_scatter_exact_with_cap():
    """The sorted per-point path must match hard_voxelize(mean, cap) +
    fused_stem EXACTLY, including the max_points cap semantics."""
    rng = np.random.default_rng(1)
    B, P = 2, 400
    pts = rng.uniform(-4, 4, (B, P, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 2, (B, P))
    # heavy duplication so the cap binds: snap xy to a coarse grid
    pts[..., :2] = np.round(pts[..., :2]) + 0.1
    mask = rng.uniform(size=(B, P)) > 0.1

    cap = 3
    enc = MODELS.build(dict(
        type='BEVColumnEncoder', in_channels=5,
        sparse_shape=[4, 16, 16], fused_stem=True, pack_xy=2,
        stem_channels=8, stage_channels=[8], stage_strides=[1],
        output_channels=8, point_path='sorted', max_points=cap,
        voxel_size=[0.5, 0.5, 1.0],
        point_cloud_range=[-4, -4, -2, 4, 4, 2]))
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    variables = enc.init(jax.random.PRNGKey(0), points=pts_j,
                         points_mask=mask_j)
    out_pts, _ = enc.apply(variables, points=pts_j, points_mask=mask_j,
                           mutable=['batch_stats'])

    vox = batch_hard_voxelize(
        pts_j, mask_j, voxel_size=(0.5, 0.5, 1.0),
        pc_range=(-4, -4, -2, 4, 4, 2), max_points=cap,
        max_voxels_per_sample=P, reduce='mean')
    out_vox, _ = enc.apply(variables, vox['voxels'], vox['coords'], B,
                           mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(out_pts), np.asarray(out_vox),
                               rtol=2e-5, atol=2e-5)
