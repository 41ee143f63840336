"""Greedy global-argmin assignment vs scipy Hungarian (VERDICT weak #5):
the on-device matcher replacing the reference's scipy host callback
(transfusion_head.py greedy_assign) must reach near-optimal matched cost
on realistic cost matrices."""
import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from tpu_bev3d.models.dense_heads.transfusion_head import greedy_assign


def _matched_cost(cost, qgt):
    return sum(cost[q, g] for q, g in enumerate(qgt) if g >= 0)


def test_greedy_near_optimal_on_random_costs():
    rng = np.random.default_rng(0)
    ratios = []
    for trial in range(50):
        Q, G = 200, rng.integers(1, 30)
        cost = rng.normal(size=(Q, G)).astype(np.float32)
        # detection-like structure: each GT has a few low-cost queries
        for g in range(G):
            qs = rng.choice(Q, size=3, replace=False)
            cost[qs, g] -= 3.0
        gt_mask = np.ones(G, bool)
        qgt = np.asarray(greedy_assign(jnp.asarray(cost),
                                       jnp.asarray(gt_mask)))
        # every valid GT matched exactly once
        matched = qgt[qgt >= 0]
        assert len(matched) == G
        assert len(set(matched.tolist())) == G
        gcost = _matched_cost(cost, qgt)
        rows, cols = linear_sum_assignment(cost.T)  # G x Q optimal
        hcost = float(cost.T[rows, cols].sum())
        # greedy ≥ optimal; ratio of excess cost stays small
        assert gcost >= hcost - 1e-4
        ratios.append((gcost - hcost) / max(abs(hcost), 1e-6))
    # near-optimal on average and never catastrophically off
    assert np.mean(ratios) < 0.02, np.mean(ratios)
    assert np.max(ratios) < 0.15, np.max(ratios)


def test_greedy_identical_when_unambiguous():
    """With well-separated costs (the common detection case) greedy IS
    the Hungarian solution."""
    rng = np.random.default_rng(1)
    for trial in range(20):
        Q, G = 64, 8
        cost = rng.uniform(1, 2, size=(Q, G)).astype(np.float32)
        perm = rng.choice(Q, size=G, replace=False)
        for g, q in enumerate(perm):
            cost[q, g] = -1.0          # unique dominant match
        qgt = np.asarray(greedy_assign(jnp.asarray(cost),
                                       jnp.asarray(np.ones(G, bool))))
        for g, q in enumerate(perm):
            assert qgt[q] == g
