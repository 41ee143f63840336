"""MSDeformAttn golden test vs a direct numpy bilinear reference."""
import numpy as np
import jax.numpy as jnp

from tpu_bev3d.ops.ms_deform_attn import ms_deform_attn


def _np_reference(value, shapes, locs, weights):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = locs.shape
    out = np.zeros((B, Q, H, D), np.float64)
    offs = np.cumsum([0] + [h * w for h, w in shapes])[:-1]
    for b in range(B):
        for q in range(Q):
            for hh in range(H):
                for li, (h, w) in enumerate(shapes):
                    vm = value[b, offs[li]:offs[li] + h * w, hh]\
                        .reshape(h, w, D)
                    for p in range(P):
                        x = locs[b, q, hh, li, p, 0] * w - 0.5
                        y = locs[b, q, hh, li, p, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        dx, dy = x - x0, y - y0
                        acc = np.zeros(D)
                        for (xi, yi, wt) in ((x0, y0, (1-dx)*(1-dy)),
                                             (x0+1, y0, dx*(1-dy)),
                                             (x0, y0+1, (1-dx)*dy),
                                             (x0+1, y0+1, dx*dy)):
                            if 0 <= xi < w and 0 <= yi < h:
                                acc += wt * vm[yi, xi]
                        out[b, q, hh] += weights[b, q, hh, li, p] * acc
    return out.reshape(B, Q, H * D)


def test_ms_deform_attn_matches_numpy():
    rng = np.random.default_rng(0)
    B, H, D, Q, P = 2, 2, 4, 5, 3
    shapes = ((6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, D)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, (B, Q, H, len(shapes), P, 2))\
        .astype(np.float32)
    w = rng.uniform(size=(B, Q, H, len(shapes), P)).astype(np.float32)
    w /= w.sum((-1, -2), keepdims=True)
    got = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                    jnp.asarray(locs), jnp.asarray(w)))
    want = _np_reference(value, shapes, locs, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
