"""bev_pool golden test against a numpy scatter reference."""
import numpy as np

from tpu_bev3d.ops.bev_pool import bev_pool

START = (0.0, 0.0, 0.0)
INTERVAL = (1.0, 1.0, 1.0)
SHAPE = (4, 4, 2)  # nx, ny, nz


def test_bev_pool_matches_numpy(rng):
    B, P, C = 2, 50, 3
    geom = rng.uniform(-0.5, 4.5, (B, P, 3)).astype(np.float32)
    feats = rng.standard_normal((B, P, C)).astype(np.float32)
    out = np.asarray(bev_pool(feats, geom, bev_start=START,
                              bev_interval=INTERVAL, bev_shape=SHAPE))
    nx, ny, nz = SHAPE
    # xy-order grid [nz, nx, ny]; cell index truncates toward zero like the
    # reference's .long() (depth_lss.py:137)
    want = np.zeros((B, nz, nx, ny, C), np.float32)
    for b in range(B):
        for p in range(P):
            c = np.trunc(geom[b, p]).astype(int)
            if np.all(c >= 0) and np.all(c < np.array(SHAPE)):
                want[b, c[2], c[0], c[1]] += feats[b, p]
    want = want.transpose(0, 1, 4, 2, 3).reshape(B, nz * C, nx, ny)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_bev_pool_grad(rng):
    import jax
    import jax.numpy as jnp
    B, P, C = 1, 20, 4
    geom = jnp.asarray(rng.uniform(0, 4, (B, P, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, P, C)).astype(np.float32))

    def loss(f):
        return jnp.sum(bev_pool(f, geom, bev_start=START,
                                bev_interval=INTERVAL, bev_shape=SHAPE) ** 2)

    g = jax.grad(loss)(feats)
    assert np.isfinite(np.asarray(g)).all()
