"""(a) Train-step batch scaling with the rbg PRNG; (b) inference-pipeline
compiled cost analysis per batch — bytes-accessed per window jumping at
batch >= 32 would pin the round-1 throughput anomaly on an XLA
layout/padding regime change rather than a tunnel artifact.

Run in background; NEVER timeout-kill (wedges the tunneled TPU grant).
"""

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
from seld_tpu.features import frame_signal  # noqa: E402
from seld_tpu.losses import SELDLossFn  # noqa: E402
from seld_tpu.models import build_model, init_variables  # noqa: E402
from seld_tpu.train import create_train_state, make_optimizer, make_train_step  # noqa: E402

WIN_FRAMES, N_SAMPLES = 250, 120_000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = Config()
    model = build_model(cfg.model, cfg.grid)
    results = {"train": {}, "infer_cost": {}}

    # (a) train-step scaling
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)
    rng = jax.random.key(0, impl="rbg")
    def measure_train(B):
        mel = jax.random.normal(jax.random.PRNGKey(0), (B, 250, 4, 64), jnp.float32)
        mask = jnp.zeros((B, 250, 648), jnp.int32).at[:, :, 100].set(8)
        em = jnp.ones((B,), jnp.float32)
        state = create_train_state(model, opt, rng, mel)
        step = make_train_step(model, loss_fn, opt, 14, donate=True)

        class C:
            s = state

        def once(i):
            C.s, met = step(C.s, mel + np.float32(i) * 1e-6, mask, em, rng)
            return met["loss"]

        t0 = time.time()
        float(once(0))
        log(f"train b{B}: compile+first {time.time() - t0:.1f}s")

        def run(n):
            t0 = time.time()
            out = None
            for i in range(n):
                out = once(i)
            float(out)
            return time.time() - t0

        best = min((run(11) - run(1)) / 10 for _ in range(2))
        return {
            "step_ms": round(best * 1e3, 2),
            "audio_s_per_s": round(B * 5.0 / best, 1),
        }

    for B in (16, 32, 64):
        for attempt in (1, 2):  # transient tunnel errors happen; retry once
            try:
                results["train"][B] = measure_train(B)
                break
            except Exception as e:
                log(f"train b{B} attempt {attempt} failed: {e}")
                time.sleep(30)
        if B in results["train"]:
            log(f"train b{B}: {results['train'][B]}")
            print(json.dumps({f"train_b{B}": results["train"][B]}), flush=True)

    # (b) inference cost analysis per batch (compile-only)
    from seld_tpu.ops.mel_pallas import log_mel_frames_pallas

    def pipeline(variables, wave):
        frames = frame_signal(wave, 960, 480)
        b, c, t, nf = frames.shape
        m = log_mel_frames_pallas(frames.reshape(-1, nf)).reshape(b, c, t, 64)
        m = jnp.transpose(m, (0, 2, 1, 3))[:, :WIN_FRAMES]
        return model.apply(variables, m, train=False).mean()

    mel0 = jnp.zeros((2, WIN_FRAMES, 4, 64), jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), mel0)
    for B in (8, 16, 32, 64):
        wave = jnp.zeros((B, 4, N_SAMPLES), jnp.float32)
        t0 = time.time()
        compiled = jax.jit(pipeline).lower(variables, wave).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        row = {
            "flops_per_window": round(float(ca.get("flops", 0)) / B / 1e9, 3),
            "gbytes_per_window": round(
                float(ca.get("bytes accessed", 0)) / B / 1e9, 4
            ),
        }
        results["infer_cost"][B] = row
        log(f"infer b{B}: compile {time.time() - t0:.1f}s {row}")
        print(json.dumps({f"infer_b{B}": row}), flush=True)

    (REPO / "logs").mkdir(exist_ok=True)

    (REPO / "logs" / "scaling.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
