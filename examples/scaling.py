"""Scaling walkthrough: mesh + FSDP + gradient accumulation + QAT.

Runs on CPU with virtual devices (set before jax initializes) — the
same code scales to a real TPU pod slice by just having more devices
visible. Demonstrates, on one tiny model:

  1. a (data, model) mesh with batch sharding + tensor parallelism
  2. ZeRO-3/FSDP parameter sharding (`mesh.shard_params` semantics)
  3. gradient accumulation (exact full-batch gradients for MSE)
  4. quantization-aware training + int8 PTQ of the result

  python examples/scaling.py
"""

from __future__ import annotations

import os

# Must happen before jax initializes. Two virtual devices keep the
# single-core CI host's collective rendezvous comfortable.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from seld_tpu.config import Config, parse_overrides  # noqa: E402
from seld_tpu.data import synthetic_corpus  # noqa: E402
from seld_tpu.losses import SELDLossFn  # noqa: E402
from seld_tpu.models import build_model  # noqa: E402
from seld_tpu.parallel import (  # noqa: E402
    batch_sharding,
    make_mesh,
    shard_variables,
    state_shardings,
)
from seld_tpu.quant import quantize_model, quantized_apply  # noqa: E402
from seld_tpu.train import (  # noqa: E402
    create_train_state,
    make_optimizer,
    make_train_step,
)
from seld_tpu.utils import setup_logging  # noqa: E402


def main():
    logger, _ = setup_logging(experiment_name="scaling_example")
    import tempfile

    cfg = parse_overrides(Config(), [
        "model.model_type=crnn",
        "model.crnn_cnn_channels=8,16",
        "model.crnn_rnn_hidden=16",
        "model.crnn_rnn_layers=1",
        "model.compute_dtype=float32",
        "window.window_seconds=1.0",
        "window.hop_seconds=0.5",
        "train.batch_size=4",
        f"data.base_path={tempfile.mkdtemp(prefix='scaling_')}",
    ])
    corpus = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(cfg.train.learning_rate)

    mel_np, mask_np = corpus.gather(np.arange(4) % len(corpus))
    mel, mask = jnp.asarray(mel_np), jnp.asarray(mask_np)
    em = jnp.ones((4,), jnp.float32)

    # -- 1+2: mesh with dp batch sharding + FSDP params -------------------
    mesh = make_mesh(n_data=2, n_model=1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    state = shard_variables(state, mesh, zero_opt_state=True,
                            shard_params=True)
    shardings = state_shardings(state, mesh, zero_opt_state=True,
                                shard_params=True)
    mel_s = jax.device_put(mel, batch_sharding(mesh, mel.ndim))
    mask_s = jax.device_put(mask, batch_sharding(mesh, mask.ndim))
    em_s = jax.device_put(em, batch_sharding(mesh, 1))

    # -- 3: gradient accumulation (2 microbatches per step) ---------------
    step = make_train_step(
        model, loss_fn, opt, cfg.grid.num_classes, donate=False,
        out_state_shardings=shardings, accum_steps=2,
    )
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        state, metrics = step(state, mel_s, mask_s, em_s, rng)
        logger.info("mesh+FSDP+accum step %d: loss %.5f", i,
                    float(metrics["loss"]))

    # -- 4: QAT for a few steps, then int8 PTQ ----------------------------
    qat_step = make_train_step(model, loss_fn, opt, cfg.grid.num_classes,
                               donate=False, qat=True)
    q_state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    for i in range(2):
        q_state, metrics = qat_step(q_state, mel, mask, em, rng)
        logger.info("QAT step %d: loss %.5f", i, float(metrics["loss"]))

    qt = quantize_model(model, q_state.variables(), [mel_np])
    logits = quantized_apply(model, q_state.variables(), qt, mel)
    logger.info("int8 PTQ of the QAT model: %d quantized layers, "
                "logits %s", len(qt), tuple(logits.shape))


if __name__ == "__main__":
    main()
