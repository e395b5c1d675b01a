"""Per-op profile of the production train step (VERDICT r2 #2).

Round 2 got the flagship fwd+bwd+Adam step to ~31 ms @ b16 (rbg PRNG)
~= 41% MFU but never profiled the CURRENT step. This script:

1. Times the production step (donated, rbg) — the number under
   optimization.
2. Captures a jax.profiler trace of several steps and writes the top-K
   device-op table (tools/profile_summary machinery).
3. Records XLA's own cost analysis (FLOPs) so MFU claims are arithmetic,
   not folklore.

Writes benchmarks/results/train_step_profile.json.
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
B, T = 16, 250
V5E_BF16_PEAK = 197e12
V5E_HBM_BYTES_PER_S = 819e9


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
    mel = jax.random.normal(jax.random.PRNGKey(0), (B, T, 4, 64), jnp.float32)
    mask = jnp.zeros((B, T, 648), jnp.int32).at[:, :, 100].set(8)
    em = jnp.ones((B,), jnp.float32)
    rng = jax.random.key(0, impl=cfg.train.prng_impl)

    results = {"batch": B, "frames": T, "prng": cfg.train.prng_impl,
               "compute_dtype": cfg.model.compute_dtype}

    state = create_train_state(model, opt, rng, mel)
    step = make_train_step(model, loss_fn, opt, 14, donate=False)

    class C:
        s = state

    def once(i):
        C.s, met = step(C.s, mel + np.float32(i) * 1e-6, mask, em, rng)
        return met["loss"]

    t0 = time.time()
    float(once(0))
    log(f"compile+first {time.time() - t0:.1f}s")

    # cost analysis (FLOPs + HBM traffic of one step): the two rooflines
    # that decide whether the measured step time is compute-bound or
    # bandwidth-bound (VERDICT r4 item 5's "X% MFU is the floor
    # because Y" accounting)
    bytes_accessed = float("nan")
    try:
        ca = step.lower(C.s, mel, mask, em, rng).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan")))
        bytes_accessed = float(ca.get("bytes accessed", float("nan")))
        results["xla_flops_per_step"] = flops
        results["xla_bytes_accessed_per_step"] = bytes_accessed
    except Exception as e:
        log(f"cost_analysis failed: {e}")
        flops = float("nan")

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
    results["step_ms"] = round(best * 1e3, 2)
    results["audio_s_per_s"] = round(B * 5.0 / best, 1)
    if np.isfinite(flops):
        results["mfu_vs_v5e_bf16_peak"] = round(flops / best / V5E_BF16_PEAK, 4)
    log(f"step {best*1e3:.2f} ms -> {results.get('mfu_vs_v5e_bf16_peak')} MFU")

    if np.isfinite(flops) and np.isfinite(bytes_accessed):
        mxu_ms = flops / V5E_BF16_PEAK * 1e3
        hbm_ms = bytes_accessed / V5E_HBM_BYTES_PER_S * 1e3
        floor_ms = max(mxu_ms, hbm_ms)
        results["roofline"] = {
            "mxu_roofline_ms": round(mxu_ms, 2),
            "hbm_roofline_ms": round(hbm_ms, 2),
            "bound": "hbm" if hbm_ms > mxu_ms else "mxu",
            "arithmetic_intensity_flops_per_byte":
                round(flops / bytes_accessed, 2),
            "v5e_ridge_flops_per_byte":
                round(V5E_BF16_PEAK / V5E_HBM_BYTES_PER_S, 1),
            "pct_of_binding_roofline": round(floor_ms / (best * 1e3), 4),
        }
        log("roofline:", json.dumps(results["roofline"]))

    # --- profile ---
    trace_dir = str(REPO / "logs" / "profile_train_b16")
    jax.profiler.start_trace(trace_dir)
    for i in range(8):
        out = once(100 + i)
    float(out)
    jax.profiler.stop_trace()
    try:
        from seld_tpu.tools.profile_summary import category_totals, summarize

        cats = category_totals(trace_dir)
        n_steps = 8.0
        results["category_ms_per_step"] = {
            k: round(v / n_steps, 3) for k, v in cats.items()
        }
        log("categories/step:", json.dumps(results["category_ms_per_step"]))

        rows, _plane = summarize(trace_dir, top=40)
        results["top_ops"] = [
            {"ms": round(ms, 3), "share": round(share, 4), "op": op}
            for ms, share, op in rows
        ]
        for r in results["top_ops"][:25]:
            log(f"{r['ms']:9.3f} ms {r['share']:6.1%} {r['op']}")
    except Exception as e:
        results["top_ops"] = f"summarize failed: {e}"
        log(f"summarize failed: {e}")

    (RESULTS / "train_step_profile.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )
    print(json.dumps({k: v for k, v in results.items() if k != "top_ops"}),
          flush=True)


if __name__ == "__main__":
    main()
