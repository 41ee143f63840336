"""BEVColumnEncoder: scatter layout + the fused-stem equivalence (the
folded scatter must equal explicit canvas + 1×1 linear exactly)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_bev3d.models.middle_encoders import BEVColumnEncoder
from tpu_bev3d.models.middle_encoders.bev_column_encoder import (
    fused_stem_scatter, scatter_columns)


def _inputs(V=96, nz=8, ny=32, nx=32, C=5, seed=0):
    rng = np.random.RandomState(seed)
    vf = rng.randn(V, C).astype(np.float32)
    coords = np.stack([np.zeros(V), rng.randint(0, nz, V),
                       rng.randint(0, ny, V), rng.randint(0, nx, V)],
                      1).astype(np.int32)
    coords[80:] = -1
    return jnp.asarray(vf), jnp.asarray(coords)


def test_fused_stem_equals_canvas_plus_linear():
    nz, ny, nx, C, p = 8, 32, 32, 5, 4
    vf, coords = _inputs(nz=nz, ny=ny, nx=nx, C=C)
    nsub = nz * p * p
    rng = np.random.RandomState(1)
    W = jnp.asarray(rng.randn(nsub, C, 16).astype(np.float32) * 0.1)

    fused = fused_stem_scatter(vf, coords, W, batch_size=1, nz=nz, ny=ny,
                               nx=nx, pack_xy=p)
    canvas = scatter_columns(vf, coords, batch_size=1, nz=nz, ny=ny,
                             nx=nx, pack_xy=p)        # [1,8,8,nsub*C]
    ref = canvas.reshape(1, nx // p, ny // p, nsub, C)
    ref = jnp.einsum('bxysc,sck->bxyk', ref, W)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_scatter_columns_xy_order():
    vf, coords = _inputs()
    out = scatter_columns(vf, coords, batch_size=1, nz=8, ny=32, nx=32,
                          pack_xy=2)
    assert out.shape == (1, 16, 16, 8 * 4 * 5)
    # one voxel lands at (row = x//2, col = y//2)
    z, y, x = np.asarray(coords[0, 1:])
    sub = z * 4 + (x % 2) * 2 + (y % 2)
    block = np.asarray(out)[0, x // 2, y // 2, sub * 5:(sub + 1) * 5]
    assert np.abs(block).sum() > 0


def test_encoder_fused_output_shape():
    vf, coords = _inputs()
    enc = BEVColumnEncoder(in_channels=5, sparse_shape=(8, 32, 32),
                           fused_stem=True, pack_xy=4, stem_channels=16,
                           stage_channels=(16, 32), stage_strides=(1, 2),
                           output_channels=32)
    variables = enc.init(jax.random.PRNGKey(0), vf, coords, 1)
    out = enc.apply(variables, vf, coords, 1)
    assert out.shape == (1, 4, 4, 32)
    assert np.isfinite(np.asarray(out)).all()
