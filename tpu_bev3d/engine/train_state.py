"""Training state pytree (params + batch_stats + optimizer state)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import optax


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any

    def replace(self, **kw):
        import dataclasses
        return dataclasses.replace(self, **kw)


def create_train_state(model, batch, tx, rng=None):
    """Init model variables on the host and wrap in a TrainState."""
    import jax.numpy as jnp
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, b: model.init(r, b, mode='tensor', train=False))(rng, batch)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)
