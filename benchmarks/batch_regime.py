"""Root-cause the batch>=32 inference per-window regression (VERDICT r2 #1).

Round-2 measured (logs lost to .gitignore — regenerated here into
benchmarks/results/): per-window cost flat at batch 8-24 (~0.40 ms) but
+12-30% at batch 32-128. This script, on the real chip:

1. Re-runs the batch sweep (bench.py methodology: chained fori_loop,
   iteration-dependent inputs, scalar read-back sync, long-minus-short)
   -> results/batch_sweep.json.
2. Captures jax.profiler traces of the serving pipeline at batch 16 and
   batch 64 and writes the top-op tables -> results/batch_profile.json.
3. Tests the candidate lever: running batch 64 as 4 chained batch-16
   pipeline calls inside ONE jitted program (if per-window cost returns
   to the batch-16 level, the regression is an XLA regime choice on the
   wide batch, and chunked serving recovers it).

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

WINDOW_S = 5.0
SR = 24_000
N_SAMPLES = int(WINDOW_S * SR)
WIN_FRAMES = 250
RESULTS = REPO / "benchmarks" / "results"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    from seld_tpu.config import Config
    from seld_tpu.features import frame_signal
    from seld_tpu.models import build_model, init_variables
    from seld_tpu.ops.mel_pallas import log_mel_frames_pallas

    cfg = Config()
    model = build_model(cfg.model, cfg.grid)

    def features(wave):  # (B, 4, N) -> (B, T, 4, 64)
        frames = frame_signal(wave, 960, 480)
        b, c, t, nf = frames.shape
        mel = log_mel_frames_pallas(frames.reshape(-1, nf))
        mel = mel.reshape(b, c, t, 64)
        return jnp.transpose(mel, (0, 2, 1, 3))[:, :WIN_FRAMES]

    def pipeline(variables, wave):
        return model.apply(variables, features(wave), train=False)

    rng = jax.random.PRNGKey(0)
    mel0 = jnp.zeros((2, WIN_FRAMES, 4, 64), jnp.float32)
    variables = init_variables(model, rng, mel0)
    return pipeline, variables


def chained_runner(pipeline, variables, batch):
    wave = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, N_SAMPLES),
                             jnp.float32)

    @jax.jit
    def chained(variables, wave, n):
        def body(i, acc):
            w = wave + i.astype(jnp.float32) * 1e-6
            return acc + pipeline(variables, w).mean()

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    return lambda n: float(chained(variables, wave, n)), wave


def measure(run, n_short=2, n_delta=20, reps=3):
    run(n_short)  # compile
    t_s = min(_t(run, n_short) for _ in range(reps))
    t_l = min(_t(run, n_short + n_delta) for _ in range(reps))
    return (t_l - t_s) / n_delta


def _t(run, n):
    t0 = time.time()
    run(n)
    return time.time() - t0


def main():
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()
    pipeline, variables = build()

    # --- 1. sweep ---
    sweep = {}
    for batch in (8, 16, 24, 32, 48, 64, 128):
        run, _ = chained_runner(pipeline, variables, batch)
        per_iter = measure(run)
        sweep[batch] = {
            "ms_per_iter": round(per_iter * 1e3, 3),
            "ms_per_window": round(per_iter * 1e3 / batch, 4),
            "audio_s_per_s": round(batch * WINDOW_S / per_iter, 1),
        }
        log(f"batch {batch}: {sweep[batch]}")
    (RESULTS / "batch_sweep.json").write_text(json.dumps(sweep, indent=2) + "\n")

    # --- 2. profiles at batch 16 vs 64 ---
    prof = {}
    jitted = jax.jit(pipeline)
    for batch in (16, 64):
        wave = jax.random.normal(jax.random.PRNGKey(2),
                                 (batch, 4, N_SAMPLES), jnp.float32)
        out = jitted(variables, wave)
        float(out.mean())  # compile + settle
        trace_dir = str(REPO / "logs" / f"profile_b{batch}")
        jax.profiler.start_trace(trace_dir)
        for _ in range(6):
            out = jitted(variables, wave)
        float(out.mean())
        jax.profiler.stop_trace()
        try:
            from seld_tpu.tools.profile_summary import summarize

            rows, _plane = summarize(trace_dir, top=30)
            prof[batch] = [
                {"ms": round(ms, 3), "share": round(share, 4), "op": op}
                for ms, share, op in rows
            ]
            for r in prof[batch][:15]:
                log(f"b{batch}: {r['ms']:8.3f} ms {r['share']:6.1%} {r['op']}")
        except Exception as e:
            prof[batch] = f"summarize failed: {e}"
            log(f"profile summarize b{batch} failed: {e}")
    (RESULTS / "batch_profile.json").write_text(json.dumps(prof, indent=2) + "\n")

    # --- 3. lever: batch 64 as 4 chained batch-16 calls in one program ---
    wave64 = jax.random.normal(jax.random.PRNGKey(1), (64, 4, N_SAMPLES),
                               jnp.float32)

    @jax.jit
    def chained_chunks(variables, wave, n):
        def body(i, acc):
            w = wave + i.astype(jnp.float32) * 1e-6

            def chunk(j, a):
                part = jax.lax.dynamic_slice_in_dim(w, j * 16, 16, axis=0)
                return a + pipeline(variables, part).mean()

            return jax.lax.fori_loop(0, 4, chunk, acc)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    run64c = lambda n: float(chained_chunks(variables, wave64, n))
    per_iter = measure(run64c)
    chunked = {
        "ms_per_iter": round(per_iter * 1e3, 3),
        "ms_per_window": round(per_iter * 1e3 / 64, 4),
        "audio_s_per_s": round(64 * WINDOW_S / per_iter, 1),
    }
    log(f"batch 64 as 4x16 chunks: {chunked}")
    out = {"sweep": sweep, "b64_as_4x16": chunked}
    (RESULTS / "batch_regime.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
