"""Batch-size sweep for the features+inference benchmark (VERDICT item 3).

Same methodology as bench.py::measure_tpu (chained fori_loop iterations,
iteration-dependent inputs, scalar read-back sync, long-minus-short delta
to cancel the tunnel round-trip), run across a list of batch sizes to
explain the round-1 anomaly where batch 32/64 scaled WORSE than 16.

Writes one JSON line per batch to stdout and a summary at the end.
Run in the background; never timeout-kill (wedges the TPU grant).
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

WINDOW_S = 5.0
SR = 24_000
N_SAMPLES = int(WINDOW_S * SR)
WIN_FRAMES = 250


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from seld_tpu.config import Config
    from seld_tpu.features import frame_signal, log_mel_spectrogram
    from seld_tpu.models import build_model, init_variables

    batches = [int(b) for b in (sys.argv[1:] or ["8", "16", "32", "64", "128"])]

    cfg = Config()
    model = build_model(cfg.model, cfg.grid)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from seld_tpu.ops.mel_pallas import log_mel_frames_pallas

    def features(wave):
        if on_tpu:
            frames = frame_signal(wave, 960, 480)
            b, c, t, nf = frames.shape
            mel = log_mel_frames_pallas(frames.reshape(-1, nf))
            mel = mel.reshape(b, c, t, 64)
            return jnp.transpose(mel, (0, 2, 1, 3))[:, :WIN_FRAMES]
        mel = log_mel_spectrogram(wave)
        return jnp.transpose(mel, (0, 3, 1, 2))[:, :WIN_FRAMES]

    @jax.jit
    def chained(variables, wave, n):
        def body(i, acc):
            w = wave + i.astype(jnp.float32) * 1e-6
            out = model.apply(variables, features(w), train=False)
            return acc + out.mean()

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    rng = jax.random.PRNGKey(0)
    mel0 = jnp.zeros((2, WIN_FRAMES, 4, 64), jnp.float32)
    variables = init_variables(model, rng, mel0)

    results = []
    for batch in batches:
        wave = jax.random.normal(rng, (batch, 4, N_SAMPLES), jnp.float32)
        # scale chain length so per-measurement work is roughly constant
        n_short = 2
        n_delta = max(4, int(round(20 * 16 / batch)))
        t0 = time.time()
        float(chained(variables, wave, n_short))
        log(f"b{batch}: compile+first {time.time() - t0:.1f}s")

        def timed(n, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                float(chained(variables, wave, n))
                best = min(best, time.time() - t0)
            return best

        t_short = timed(n_short)
        t_long = timed(n_short + n_delta)
        per_iter = (t_long - t_short) / n_delta
        thr = batch * WINDOW_S / per_iter
        row = {
            "batch": batch,
            "ms_per_iter": round(per_iter * 1e3, 3),
            "ms_per_window": round(per_iter * 1e3 / batch, 4),
            "audio_s_per_s": round(thr, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    best = max(results, key=lambda r: r["audio_s_per_s"])
    print(json.dumps({"best": best, "sweep": results}), flush=True)
    (REPO / "logs").mkdir(exist_ok=True)
    (REPO / "logs" / "batch_sweep.json").write_text(
        json.dumps({"best": best, "sweep": results}, indent=2)
    )


if __name__ == "__main__":
    main()
