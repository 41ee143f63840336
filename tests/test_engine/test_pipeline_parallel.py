"""Pipeline-parallel (GPipe microbatch) exactness on the 8-device mesh.

make_pipeline over stage-sharded weights must reproduce the sequential
chain stage_{n−1}(…stage_0(x)…) for every microbatch — the ring shift is
a permutation and the final psum sums one non-zero buffer, so fp32
agreement is tight.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from tpu_bev3d.parallel.pipeline import make_pipeline


@pytest.fixture
def mesh():
    devs = jax.devices('cpu')[:8]
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices')
    return Mesh(np.asarray(devs), ('data',))


def _stage(params, x):
    w, b = params
    return jnp.tanh(x @ w + b)


@pytest.mark.parametrize('n_micro', [1, 3, 8, 13])
def test_pipeline_matches_sequential(mesh, rng, n_micro):
    n, C, B = 8, 16, 4
    ws = rng.standard_normal((n, C, C)).astype(np.float32) * 0.5
    bs = rng.standard_normal((n, C)).astype(np.float32) * 0.1
    x = rng.standard_normal((n_micro, B, C)).astype(np.float32)

    want = jnp.asarray(x)
    for i in range(n):
        want = _stage((ws[i], bs[i]), want)

    got = make_pipeline(mesh, _stage, (ws, bs))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_conv_stages(mesh, rng):
    """Shape-preserving conv stages (the BEV-trunk use case)."""
    n = 8
    ws = rng.standard_normal((n, 3, 3, 8, 8)).astype(np.float32) * 0.2
    x = rng.standard_normal((5, 2, 16, 16, 8)).astype(np.float32)

    def stage(w, t):
        return jax.nn.relu(jax.lax.conv_general_dilated(
            t, w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')))

    want = jnp.asarray(x).reshape(5 * 2, 16, 16, 8)
    for i in range(n):
        want = stage(ws[i], want)
    want = want.reshape(5, 2, 16, 16, 8)
    got = make_pipeline(mesh, stage, ws)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
