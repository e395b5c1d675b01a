"""End-to-end int8 PTQ serving throughput vs the bf16 baseline.

Same fused pipeline and methodology as bench.py (features + flagship
forward chained in one jitted fori_loop, long-minus-short), with the
model forward swapped to seld_tpu.quant.quantized_apply. The int8_probe
microbench showed conv s8xs8->s32 at ~1.46x the bf16 trunk-conv
throughput; this measures how much of that survives in the full
pipeline (mel front-end, norms, attention, and quant/dequant VPU work
are unaffected by int8).

Writes benchmarks/results/int8_serving.json.
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

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = REPO / "benchmarks" / "results"
BATCH, WINDOW_S, SR = 16, 5.0, 24000
WIN_FRAMES, N_SAMPLES = 250, int(WINDOW_S * SR)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    from seld_tpu.config import Config
    from seld_tpu.features import frame_signal
    from seld_tpu.models import build_model, init_variables
    from seld_tpu.ops.mel_pallas import log_mel_frames_pallas
    from seld_tpu.quant import quantize_model, quantized_apply

    cfg = Config()
    model = build_model(cfg.model, cfg.grid)

    def features(wave):  # (B, 4, N) -> (B, T, 4, 64)
        frames = frame_signal(wave, 960, 480)
        b, c, t, nf = frames.shape
        mel = log_mel_frames_pallas(frames.reshape(-1, nf))
        mel = mel.reshape(b, c, t, 64)
        return jnp.transpose(mel, (0, 2, 1, 3))[:, :WIN_FRAMES]

    rng = jax.random.PRNGKey(0)
    wave = jax.random.normal(rng, (BATCH, 4, N_SAMPLES), jnp.float32)
    mel0 = jnp.zeros((BATCH, WIN_FRAMES, 4, 64), jnp.float32)
    variables = init_variables(model, rng, mel0)

    calib = features(wave)
    qt = quantize_model(model, variables, [calib])
    log(f"quantized layers: {len(qt)}")

    def chained_of(apply_fn):
        @jax.jit
        def chained(variables, qt, wave, n):
            def body(i, acc):
                w = wave + i.astype(jnp.float32) * 1e-6
                out = apply_fn(variables, qt, features(w))
                return acc + out.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        return chained

    variants = {
        "bf16": chained_of(
            lambda v, q, mel: model.apply(v, mel, train=False)
        ),
        "int8": chained_of(
            lambda v, q, mel: quantized_apply(model, v, q, mel)
        ),
    }

    n_short, n_delta = 2, 20
    results = {}
    for name, chained in variants.items():
        t0 = time.time()
        float(chained(variables, qt, wave, n_short))
        log(f"[{name}] compile+first {time.time() - t0:.1f}s")

        def timed(n, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                float(chained(variables, qt, wave, n))
                best = min(best, time.time() - t0)
            return best

        t_short = timed(n_short)
        t_long = timed(n_short + n_delta)
        per_iter = (t_long - t_short) / n_delta
        thr = BATCH * WINDOW_S / per_iter
        results[name] = {
            "ms_per_iter": round(per_iter * 1e3, 3),
            "audio_s_per_s": round(thr, 1),
        }
        log(f"[{name}] {per_iter * 1e3:.2f} ms/iter -> {thr:.0f} audio_s/s")
        print(json.dumps({name: results[name]}), flush=True)

    if "bf16" in results and "int8" in results:
        results["speedup"] = round(
            results["int8"]["audio_s_per_s"] / results["bf16"]["audio_s_per_s"], 3
        )
    (RESULTS / "int8_serving.json").write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
