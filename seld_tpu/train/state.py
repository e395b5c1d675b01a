"""Train state: params + batch stats + optimizer state as one pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from seld_tpu.models import init_variables


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(model, optimizer, rng, sample_input) -> TrainState:
    variables = init_variables(model, rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def param_count(state: TrainState) -> int:
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
