"""Gradient accumulation on chip: effective batches past the direct
limit.

Round 3 measured direct train-step batch scaling to b64 (141 ms,
train_batch_scale.json). This measures the accumulated step at the same
effective batch (parity + overhead check) and at effective batches a
direct step's activations could not hold, with per-window cost:

  b64  direct        (reference point)
  b64  = 4  x mb16   (overhead of the scan vs direct)
  b256 = 16 x mb16   (beyond the direct ceiling)

Writes benchmarks/results/accum_scale.json.
Run in background; NEVER timeout-kill (wedges the tunneled TPU grant).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = REPO / "benchmarks" / "results"
T = 250


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    from seld_tpu.config import Config
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model
    from seld_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = Config()
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)
    rng = jax.random.key(0, impl=cfg.train.prng_impl)

    results = {}
    for name, batch, accum in (
        ("b64_direct", 64, 1),
        ("b64_accum4", 64, 4),
        ("b256_accum16", 256, 16),
    ):
        mel = jax.random.normal(jax.random.PRNGKey(0), (batch, T, 4, 64),
                                jnp.float32)
        mask = jnp.zeros((batch, T, 648), jnp.int32).at[:, :, 100].set(8)
        em = jnp.ones((batch,), jnp.float32)
        state = create_train_state(model, opt, rng, mel[:16])
        step = make_train_step(model, loss_fn, opt, 14, donate=False,
                               accum_steps=accum)

        def once(i, s):
            s, met = step(s, mel + np.float32(i) * 1e-6, mask, em, rng)
            return s, met["loss"]

        t0 = time.time()
        state, loss = once(0, state)
        loss = float(loss)
        log(f"[{name}] compile+first {time.time() - t0:.1f}s loss {loss:.4f}")

        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _, l1 = once(0, state)
            float(l1)
            t1 = time.time() - t0
            t0 = time.time()
            out = None
            for i in range(5):
                _, out = once(i, state)
            float(out)
            t5 = time.time() - t0
            best = min(best, (t5 - t1) / 4)
        results[name] = {
            "batch": batch,
            "accum_steps": accum,
            "step_ms": round(best * 1e3, 1),
            "ms_per_window": round(best * 1e3 / batch, 3),
            "audio_s_per_s": round(batch * 5.0 / best, 0),
            "loss_first_step": round(loss, 6),
        }
        log(f"[{name}] {results[name]}")
        print(json.dumps({name: results[name]}), flush=True)

    (RESULTS / "accum_scale.json").write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
