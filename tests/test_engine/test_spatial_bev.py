"""Spatial BEV sharding with halo exchange: exact vs dense conv."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpu_bev3d.parallel import make_sharded_trunk, shard_bev


def _dense_trunk(x, weights):
    for w in weights:
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding='SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = jax.nn.relu(x)
    return x


def test_halo_trunk_matches_dense():
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = Mesh(np.asarray(devs[:8]), ('data',))
    rng = np.random.default_rng(0)
    B, X, Y, C = 2, 64, 24, 8
    x = jnp.asarray(rng.normal(size=(B, X, Y, C)).astype(np.float32))
    weights = [jnp.asarray(rng.normal(
        size=(3, 3, C, C)).astype(np.float32)) * 0.1 for _ in range(3)]

    ref = _dense_trunk(x, weights)
    xs = shard_bev(x, mesh)
    out = make_sharded_trunk(mesh, weights)(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # output stays sharded along X over the mesh
    assert len(out.sharding.device_set) == 8
