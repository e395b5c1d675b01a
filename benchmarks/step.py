"""Full train-step timing with the production make_train_step path,
comparing PRNG impls (threefry vs rbg) at batch 16. Round-1 baseline:
36.6 ms/step. Run in background; NEVER timeout-kill."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from seld_tpu.config import Config  # noqa: E402
from seld_tpu.losses import SELDLossFn  # noqa: E402
from seld_tpu.models import build_model  # noqa: E402
from seld_tpu.train import create_train_state, make_optimizer, make_train_step  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = Config()
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)
    B, T = 16, 250
    mel = jax.random.normal(jax.random.PRNGKey(0), (B, T, 4, 64), jnp.float32)
    mask = jnp.zeros((B, T, 648), jnp.int32).at[:, :, 100].set(8)
    em = jnp.ones((B,), jnp.float32)

    results = {}
    for impl in ("threefry2x32", "rbg"):
        rng = jax.random.key(0, impl=impl)
        state = create_train_state(model, opt, rng, mel)
        step = make_train_step(model, loss_fn, opt, 14, donate=False)

        class C:
            s = state

        def once(i):
            C.s, met = step(C.s, mel + np.float32(i) * 1e-6, mask, em, rng)
            return met["loss"]

        t0 = time.time()
        float(once(0))
        log(f"[{impl}] compile+first {time.time() - t0:.1f}s")

        def run(n):
            t0 = time.time()
            out = None
            for i in range(n):
                out = once(i)
            float(out)
            return time.time() - t0

        best = float("inf")
        for _ in range(2):
            t1, t11 = run(1), run(11)
            best = min(best, (t11 - t1) / 10)
        thr = B * 5.0 / best
        results[impl] = {"step_ms": round(best * 1e3, 2),
                         "audio_s_per_s": round(thr, 1)}
        log(f"[{impl}] {best * 1e3:.2f} ms/step -> {thr:.0f} audio_s/s")
        print(json.dumps({impl: results[impl]}), flush=True)

    (REPO / "logs").mkdir(exist_ok=True)

    (REPO / "logs" / "step_prng.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
