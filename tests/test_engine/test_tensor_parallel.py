"""Tensor-parallel (Megatron-style) exactness on the 8-device CPU mesh.

tp_mlp / tp_attention over column/row-sharded weights must reproduce
the dense single-device computation (one psum per pair; fp32 so the
only tolerance is reduction order).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from tpu_bev3d.parallel.tensor_parallel import (make_tp_attention,
                                                make_tp_mlp)


@pytest.fixture
def mesh():
    devs = jax.devices('cpu')[:8]
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices')
    return Mesh(np.asarray(devs), ('data',))


def test_tp_mlp_matches_dense(mesh, rng):
    C, H, T = 32, 128, 49
    x = rng.standard_normal((2, T, C)).astype(np.float32)
    w1 = rng.standard_normal((C, H)).astype(np.float32) * 0.1
    b1 = rng.standard_normal((H,)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((H, C)).astype(np.float32) * 0.1
    b2 = rng.standard_normal((C,)).astype(np.float32) * 0.1
    want = jax.nn.gelu(x @ w1 + b1) @ w2 + b2
    got = make_tp_mlp(mesh, w1, b1, w2, b2)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_attention_matches_dense(mesh, rng):
    C, heads, T = 64, 8, 49
    hd = C // heads
    x = rng.standard_normal((3, T, C)).astype(np.float32)
    wqkv = rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.1
    wo = rng.standard_normal((C, C)).astype(np.float32) * 0.1

    # dense reference with the standard [3, heads, hd] output layout
    qkv = (x @ wqkv).reshape(3, T, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = jnp.swapaxes(q, 1, 2)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    a = jax.nn.softmax(q @ jnp.swapaxes(k, -1, -2) / np.sqrt(hd), -1)
    o = jnp.swapaxes(a @ v, 1, 2).reshape(3, T, C)
    want = o @ wo

    got = make_tp_attention(mesh, wqkv, wo, heads)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
