"""Convergence A/B: greedy on-device matcher vs scipy Hungarian in the
TransFusion head's training loop (VERDICT round-1 weak #5 follow-up to
the matched-cost parity test).

Trains a tiny BEVFusionHead twice on a fixed synthetic scene — identical
init, data, and optimizer; only the query↔GT assignment differs:
  (a) greedy_assign (the shipped in-graph matcher)
  (b) scipy linear_sum_assignment via jax.pure_callback (the reference's
      host Hungarian, ref TransFusionHead get_targets)
and reports the loss trajectories. Run on CPU:
  env JAX_PLATFORMS=cpu python tools/ab_matcher_convergence.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(steps=150):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    import optax
    from scipy.optimize import linear_sum_assignment

    from tpu_bev3d.registry import MODELS
    import tpu_bev3d.models  # noqa: F401
    import tpu_bev3d.models.dense_heads.transfusion_head as th

    def hungarian_assign(cost, gt_mask, big=1e9):
        """Drop-in greedy_assign replacement via host scipy."""
        Q = cost.shape[0]

        def host(c, m):
            c = np.asarray(c, np.float64)
            m = np.asarray(m)
            qgt = np.full((Q,), -1, np.int32)
            gs = np.nonzero(m)[0]
            if len(gs):
                rows, cols = linear_sum_assignment(c[:, gs].T)
                for g_i, q in zip(rows, cols):
                    qgt[q] = gs[g_i]
            return qgt

        # assignment is a non-differentiable integer decision — match the
        # in-graph matcher's semantics by cutting gradients at the cost
        return jax.pure_callback(
            host, jax.ShapeDtypeStruct((Q,), jnp.int32),
            jax.lax.stop_gradient(cost), jax.lax.stop_gradient(gt_mask),
            vmap_method='sequential')

    def run(assign_fn, seed=0):
        th.greedy_assign, orig = assign_fn, th.greedy_assign
        try:
            head = MODELS.build(dict(
                type='BEVFusionHead', num_classes=4, in_channels=32,
                hidden_channel=32, num_proposals=24, num_heads=4,
                ffn_channel=64,
                point_cloud_range=(-16., -16., -5., 16., 16., 3.),
                voxel_size=(1.0, 1.0, 0.2), out_size_factor=1))
            rng = np.random.default_rng(3)
            feats = jnp.asarray(rng.normal(size=(2, 32, 32, 32))
                                .astype(np.float32))
            G = 6
            gtb = np.zeros((2, G, 9), np.float32)
            gtb[..., :2] = rng.uniform(-14, 14, (2, G, 2))
            gtb[..., 2] = -1.0
            gtb[..., 3:6] = rng.uniform(1, 4, (2, G, 3))
            gtb[..., 6] = rng.uniform(-3, 3, (2, G))
            gtb = jnp.asarray(gtb)
            gtl = jnp.asarray(rng.integers(0, 4, (2, G)))
            gtm = jnp.ones((2, G), bool)

            variables = head.init(jax.random.PRNGKey(seed), feats)
            params = variables['params']
            bs = variables.get('batch_stats', {})
            tx = optax.adam(1e-3)
            opt = tx.init(params)

            def loss_fn(p):
                outs, mut = head.apply(
                    dict(params=p, batch_stats=bs), feats, train=True,
                    mutable=['batch_stats'])
                losses = head.apply(dict(params=p, batch_stats=bs),
                                    outs, gtb, gtl, gtm,
                                    method=head.loss_by_feat)
                return sum(jnp.asarray(v) for v in losses.values())

            grad_fn = jax.jit(jax.value_and_grad(loss_fn))
            hist = []
            for i in range(steps):
                loss, g = grad_fn(params)
                up, opt = tx.update(g, opt)
                params = optax.apply_updates(params, up)
                hist.append(float(loss))
            return hist
        finally:
            th.greedy_assign = orig

    orig_greedy = th.greedy_assign
    h_greedy = run(orig_greedy)
    h_hung = run(hungarian_assign)

    import json
    print(json.dumps(dict(
        steps=steps,
        greedy=dict(first=h_greedy[0], mid=h_greedy[steps // 2],
                    final=h_greedy[-1]),
        hungarian=dict(first=h_hung[0], mid=h_hung[steps // 2],
                       final=h_hung[-1]),
        final_gap_pct=100 * (h_greedy[-1] - h_hung[-1])
        / max(abs(h_hung[-1]), 1e-6))))


if __name__ == '__main__':
    main()
