"""SparseEncoder tile backend == flat backend (same params, same output)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_bev3d.models.middle_encoders.sparse_encoder import SparseEncoder


def _mini_encoder(backend):
    return SparseEncoder(
        in_channels=4, sparse_shape=(16, 32, 32), base_channels=8,
        output_channels=16,
        encoder_channels=((8,), (16, 16), (16, 16)),
        encoder_paddings=((1,), (1, 1), (1, 1)),
        conv_out_kernel=(3, 1, 1), conv_out_stride=(2, 1, 1),
        backend=backend, tile_shape=(2, 4, 4), tile_capacity=256)


def _sparse_input(rng, n=120, cap=160, batch=2):
    coords = set()
    while len(coords) < n:
        b = rng.integers(0, batch)
        z = rng.integers(0, 16)
        y, x = rng.integers(0, 32), rng.integers(0, 32)
        coords.add((b, z, y, x))
    coords = np.array(sorted(coords), np.int32)
    feats = rng.standard_normal((n, 4)).astype(np.float32)
    fpad = np.zeros((cap, 4), np.float32)
    cpad = np.full((cap, 4), -1, np.int32)
    fpad[:n] = feats
    cpad[:n] = coords
    return jnp.asarray(fpad), jnp.asarray(cpad)


def test_tile_encoder_matches_flat(rng):
    feats, coords = _sparse_input(rng)
    flat = _mini_encoder('flat')
    tile = _mini_encoder('tile')
    params = flat.init(jax.random.PRNGKey(0), feats, coords, 2)
    out_flat = flat.apply(params, feats, coords, 2)
    out_tile = tile.apply(params, feats, coords, 2)  # identical param tree
    assert out_flat.shape == out_tile.shape
    np.testing.assert_allclose(np.asarray(out_flat), np.asarray(out_tile),
                               rtol=1e-4, atol=1e-4)


def test_tile_encoder_explicit_stage_capacities(rng):
    """Explicit per-stage tile_capacities (the dilation-aware schedule the
    faithful configs ship, see configs/bevfusion/*_nus.py) must reproduce
    the flat-backend output exactly when ample, and actually bind (drop
    sites) when a post-downsample stage is under-provisioned — proving the
    schedule reaches every stage rather than only stage 0."""
    feats, coords = _sparse_input(rng)
    flat = _mini_encoder('flat')
    params = flat.init(jax.random.PRNGKey(0), feats, coords, 2)
    out_flat = flat.apply(params, feats, coords, 2)

    def with_caps(caps):
        enc = SparseEncoder(
            in_channels=4, sparse_shape=(16, 32, 32), base_channels=8,
            output_channels=16,
            encoder_channels=((8,), (16, 16), (16, 16)),
            encoder_paddings=((1,), (1, 1), (1, 1)),
            conv_out_kernel=(3, 1, 1), conv_out_stride=(2, 1, 1),
            backend='tile', tile_shape=(2, 4, 4),
            tile_capacities=caps)
        return enc.apply(params, feats, coords, 2)

    # ample non-monotone schedule (stage-1 > stage-0, the spconv-dilation
    # shape): exact vs flat
    out_ample = with_caps([160, 192, 96])
    np.testing.assert_allclose(np.asarray(out_flat), np.asarray(out_ample),
                               rtol=1e-4, atol=1e-4)
    # under-provision ONLY the post-down0 stage: output must change
    out_tight = with_caps([160, 8, 96])
    assert not np.allclose(np.asarray(out_ample), np.asarray(out_tight),
                           atol=1e-4)


def test_tile_encoder_train_step_grads(rng):
    feats, coords = _sparse_input(rng, n=60, cap=80)
    enc = _mini_encoder('tile')
    params = enc.init(jax.random.PRNGKey(0), feats, coords, 2, train=False)

    def loss(p):
        out, _ = enc.apply(p, feats, coords, 2, train=True,
                           mutable=['batch_stats'])
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g['params'])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
