"""Train-step batch scaling on chip (round-2 weak item #7 retry).

Round 2 recorded a deterministic tunnel-side INVALID_ARGUMENT executing
the full flagship train step at b32/b64 (b16 fine, inference-only fine
to b128). Round 3 saw a TRANSIENT b16 INVALID_ARGUMENT, so the
"deterministic" label deserves one controlled retry: run the production
step at b16/b24/b32/b48/b64, recording either timings or the error per
batch. Writes benchmarks/results/train_batch_scale.json.

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
    for B in (16, 24, 32, 48, 64):
        mel = jax.random.normal(jax.random.PRNGKey(0), (B, T, 4, 64),
                                jnp.float32)
        mask = jnp.zeros((B, T, 648), jnp.int32).at[:, :, 100].set(8)
        em = jnp.ones((B,), jnp.float32)
        try:
            state = create_train_state(model, opt, rng, mel)
            step = make_train_step(model, loss_fn, opt, 14, donate=False)

            class C:
                s = state

            def once(i):
                C.s, met = step(C.s, mel + np.float32(i) * 1e-6, mask, em, rng)
                return met["loss"]

            t0 = time.time()
            l0 = float(once(0))
            log(f"[b{B}] compile+first {time.time() - t0:.1f}s loss {l0:.5f}")

            def run(n):
                t0 = time.time()
                out = None
                for i in range(n):
                    out = once(i)
                float(out)
                return time.time() - t0

            best = float("inf")
            for _ in range(3):
                t1, t11 = run(1), run(11)
                best = min(best, (t11 - t1) / 10)
            results[B] = {
                "step_ms": round(best * 1e3, 2),
                "ms_per_window": round(best * 1e3 / B, 3),
                "audio_s_per_s": round(B * 5.0 / best, 1),
            }
            log(f"[b{B}] {results[B]}")
        except Exception as e:
            results[B] = f"failed: {type(e).__name__}: {str(e)[:160]}"
            log(f"[b{B}] FAILED {type(e).__name__}: {e}")
        print(json.dumps({B: results[B]}), flush=True)

    (RESULTS / "train_batch_scale.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )


if __name__ == "__main__":
    main()
