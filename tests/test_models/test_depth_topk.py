"""depth_topk sparsified lift: with k close to D the pooled BEV must
approximate the exact dense lift; with peaked depth it must match
closely even for small k."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_bev3d.models.view_transforms.depth_lss import LSSTransform


def _build(k):
    return LSSTransform(
        in_channels=16, out_channels=8, image_size=(32, 88),
        feature_size=(8, 22), xbound=(-10., 10., 0.5),
        ybound=(-10., 10., 0.5), zbound=(-10., 10., 20.),
        dbound=(1., 13., 1.0), downsample=1, depth_topk=k)


def _cam_params(B, N, rng):
    intrins = np.tile(np.array([[30., 0, 44.], [0, 30., 16.],
                                [0, 0, 1.]], np.float32), (B, N, 1, 1))
    cam2lidar = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    cam2lidar[:, :, :3, :3] = R
    return dict(cam2lidar=jnp.asarray(cam2lidar),
                intrins=jnp.asarray(intrins),
                post_rots=jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                              (B, N, 1, 1))),
                post_trans=jnp.zeros((B, N, 3), jnp.float32))


@pytest.mark.parametrize('k,tol', [(12, 1e-5), (4, 2.0)])
def test_depth_topk_approximates_dense(k, tol):
    """k = D must be EXACT (renormalization is a no-op). Small k on an
    untrained net (near-uniform softmax) only gets a loose sanity bound —
    the approximation premise is a peaked trained depth head."""
    B, N = 1, 2
    rng = np.random.RandomState(0)
    img = rng.randn(B, N, 8, 22, 16).astype(np.float32)
    cam = _cam_params(B, N, rng)

    dense_m = _build(0)
    variables = dense_m.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    out_dense, _ = dense_m.apply(variables, jnp.asarray(img), cam)
    sparse_m = _build(k)
    out_sparse, _ = sparse_m.apply(variables, jnp.asarray(img), cam)

    a, b = np.asarray(out_sparse), np.asarray(out_dense)
    assert a.shape == b.shape
    denom = max(1e-6, float(np.abs(b).max()))
    assert np.max(np.abs(a - b)) / denom < tol


def test_precomputed_ranks_match_dynamic_geometry():
    """Deploy fast path: pooling with precomputed flat ranks must equal
    the dynamic-geometry path exactly (depth_topk=0)."""
    B, N = 1, 2
    rng = np.random.RandomState(7)
    img = rng.randn(B, N, 8, 22, 16).astype(np.float32)
    cam = _cam_params(B, N, rng)
    m = _build(0)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    out_dyn, _ = m.apply(variables, jnp.asarray(img), cam)
    ranks = m.precompute_bev_ranks(cam)
    cam2 = dict(cam, geom_ranks=ranks)
    out_pre, _ = m.apply(variables, jnp.asarray(img), cam2)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_dyn),
                               rtol=1e-5, atol=1e-5)


def test_camera_mask_zeroes_missing_camera():
    B, N = 1, 2
    rng = np.random.RandomState(8)
    img = rng.randn(B, N, 8, 22, 16).astype(np.float32)
    cam = _cam_params(B, N, rng)
    m = _build(0)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    cam_all = dict(cam, camera_mask=jnp.ones((B, N)))
    cam_one = dict(cam, camera_mask=jnp.asarray([[1.0, 0.0]]))
    out_all, _ = m.apply(variables, jnp.asarray(img), cam_all)
    out_one, _ = m.apply(variables, jnp.asarray(img), cam_one)
    # dropping camera 1 must change the pooled BEV but keep it finite
    assert not np.allclose(np.asarray(out_all), np.asarray(out_one))
    assert np.isfinite(np.asarray(out_one)).all()


def test_precomputed_ranks_with_topk_match_dynamic():
    """Deploy path ∘ top-k: gathering static all-bin ranks by the kept
    bins must equal the online top-k geometry path exactly."""
    B, N = 1, 2
    rng = np.random.RandomState(9)
    img = rng.randn(B, N, 8, 22, 16).astype(np.float32)
    cam = _cam_params(B, N, rng)
    m = _build(6)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(img), cam)
    out_dyn, _ = m.apply(variables, jnp.asarray(img), cam)
    ranks = m.precompute_bev_ranks(cam)
    out_pre, _ = m.apply(variables, jnp.asarray(img),
                         dict(cam, geom_ranks=ranks))
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_dyn),
                               rtol=1e-5, atol=1e-5)
