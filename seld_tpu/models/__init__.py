from seld_tpu.models.registry import build_model, MODEL_REGISTRY  # noqa: F401

import jax as _jax


def init_variables(model, rng, sample_input, train: bool = False):
    """Initialize model variables under jit (one fused compile instead of
    eager per-param dispatch — ~7x faster on CPU, more on TPU)."""

    @_jax.jit
    def _init(r, x):
        return model.init({"params": r, "dropout": r}, x, train=train)

    return _init(rng, sample_input)
