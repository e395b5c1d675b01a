"""Optimizer: Adam with coupled L2 weight decay, host-adjustable LR.

The reference uses torch.optim.Adam(lr, weight_decay=1e-4)
(ref trainer.py:112-116) whose weight decay is L2 ADDED TO THE GRADIENT
before the Adam moments — NOT AdamW's decoupled decay. The optax chain
reproduces that: add_decayed_weights -> scale_by_adam -> scale(-lr).

The learning rate is an injected hyperparameter so the host-side
ReduceLROnPlateau (data-dependent control flow, kept outside jit exactly
as the reference keeps it outside the step) can rewrite it between epochs
without recompilation.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def make_optimizer(learning_rate: float, weight_decay: float = 1e-4,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    @optax.inject_hyperparams
    def _adam_l2(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.scale(-learning_rate),
        )

    return _adam_l2(learning_rate=jnp.asarray(learning_rate, jnp.float32))


def set_learning_rate(opt_state, lr: float):
    """Return opt_state with the injected LR replaced (host-side)."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hyperparams)


def current_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
