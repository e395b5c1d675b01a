"""TTA serving cost on chip: plain vs 4-transform vs 16-transform.

Measures the flagship (ResNet50-Conformer) eval forward at batch 16 on
mel_iv features (TTA's required feature set) with seld_tpu.tta's
scan-over-transforms forward, same chained-fori_loop long-minus-short
methodology as bench.py. The interesting questions: does the TTA scan
stay at ~K x the plain forward (no VMEM/layout regression from the scan
or the cell-gathers), and what absolute audio_s/s remains at K=16.

Writes benchmarks/results/tta_perf.json.
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
BATCH, WINDOW_S, WIN_FRAMES, N_MELS = 16, 5.0, 250, 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    from seld_tpu.config import Config
    from seld_tpu.models import build_model, init_variables
    from seld_tpu.tta import make_tta_forward

    cfg = Config().replace_path("features.feature_set", "mel_iv")
    model = build_model(cfg.model, cfg.grid)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(
        rng, (BATCH, WIN_FRAMES, 7, N_MELS), jnp.float32
    )
    variables = init_variables(model, rng, mel)

    def plain_fwd(v, m):
        logits = model.apply(v, m, train=False)
        return jax.nn.softmax(logits, axis=2)

    def variant(fwd):
        @jax.jit
        def chained(v, mel, n):
            def body(i, acc):
                m = mel + i.astype(jnp.float32) * 1e-6
                return acc + fwd(v, m).astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        return chained

    def tta16(fold):
        return make_tta_forward(
            lambda v, m: model.apply(v, m, train=False),
            cfg.grid.n_el, cfg.grid.n_az, "mel_iv",
            kind="grid", fold=fold,
        )

    # (name, fwd, batch): the b16 rows keep comparability with the
    # round-4 artifact; the b8 fold ladder is the VERDICT r4 #8 A/B —
    # the predictor's native batch_windows=8, where fold 2/3 keeps the
    # device batch inside the flat b8-24 VMEM regime and fold 4 (b32)
    # probes the regime edge.
    mel8 = mel[:8]
    variants = {
        "plain": (variant(plain_fwd), mel, BATCH),
        "tta4": (variant(make_tta_forward(
            lambda v, m: model.apply(v, m, train=False),
            cfg.grid.n_el, cfg.grid.n_az, "mel_iv",
            transforms=(0, 1, 2, 3), kind="grid",
        )), mel, BATCH),
        "tta16": (variant(tta16(1)), mel, BATCH),
        "plain_b8": (variant(plain_fwd), mel8, 8),
        "tta16_b8_fold1": (variant(tta16(1)), mel8, 8),
        "tta16_b8_fold2": (variant(tta16(2)), mel8, 8),
        "tta16_b8_fold4": (variant(tta16(4)), mel8, 8),
    }

    n_short = 2
    results = {}
    for name, (chained, m_in, batch) in variants.items():
        n_delta = 40 if "plain" in name else (16 if "tta4" in name else 6)
        t0 = time.time()
        float(chained(variables, m_in, n_short))
        log(f"[{name}] compile+first {time.time() - t0:.1f}s")

        def timed(n, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                float(chained(variables, m_in, n))
                best = min(best, time.time() - t0)
            return best

        t_short = timed(n_short)
        t_long = timed(n_short + n_delta)
        per_iter = (t_long - t_short) / n_delta
        thr = batch * WINDOW_S / per_iter
        results[name] = {
            "ms_per_iter": round(per_iter * 1e3, 3),
            "audio_s_per_s": round(thr, 1),
        }
        log(f"[{name}] {per_iter * 1e3:.2f} ms/iter -> {thr:.0f} audio_s/s")
        print(json.dumps({name: results[name]}), flush=True)

    for k, n, ref in (("tta4", 4, "plain"), ("tta16", 16, "plain"),
                      ("tta16_b8_fold1", 16, "plain_b8"),
                      ("tta16_b8_fold2", 16, "plain_b8"),
                      ("tta16_b8_fold4", 16, "plain_b8")):
        if k in results and ref in results:
            results[f"{k}_overhead_vs_{n}x"] = round(
                results[k]["ms_per_iter"]
                / (n * results[ref]["ms_per_iter"]), 3
            )
    (RESULTS / "tta_perf.json").write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()


# Measured 2026-08-18 (v5e chip via tunnel): see results/tta_perf.json.
