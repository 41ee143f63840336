"""Pallas NMS scan (interpreter mode on CPU) vs the XLA reference scan."""
import numpy as np

import jax.numpy as jnp

from tpu_bev3d.ops.nms import _greedy_scan
from tpu_bev3d.ops.pallas_nms import greedy_scan_pallas


def test_pallas_scan_matches_xla(rng):
    n = 64
    for seed in range(3):
        r = np.random.default_rng(seed)
        sup = r.uniform(size=(n, n)) < 0.1
        sup |= sup.T
        np.fill_diagonal(sup, False)
        valid = r.uniform(size=n) < 0.9
        ref = np.asarray(_greedy_scan(jnp.asarray(sup), jnp.asarray(valid)))
        out = np.asarray(greedy_scan_pallas(jnp.asarray(sup),
                                            jnp.asarray(valid),
                                            interpret=True))
        assert (ref == out).all(), seed
