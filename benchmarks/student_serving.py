"""Per-backbone serving throughput on the chip (full features+forward
pipeline) — the serving payoff table for knowledge distillation.

BASELINE_CPU.json records the reference's per-backbone CPU forwards;
this measures OUR pipeline per backbone on the v5e at the bench shapes
(batch 16, 5 s windows), so the distillation recipe (docs/RECIPES.md:
flagship teacher -> cheap student) can quote its serving payoff with
chip evidence: what a crnn-family student buys over serving the
flagship. Throughput is weight-independent (dense forwards), so models
run with initializer weights.

Methodology = bench.py's (module docstring there): chained fori_loop
iterations with iteration-dependent inputs inside ONE executable,
scalar host read-back sync, long-minus-short delta to cancel the
tunnel round-trip. Writes benchmarks/results/student_serving.json.

Run from the repo root with the axon sitecustomize on PYTHONPATH; size
the run to finish — never timeout-kill a TPU-attached process.
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

from bench import BATCH, N_SAMPLES, WIN_FRAMES, WINDOW_S, log, wait_for_accelerator  # noqa: E402

RESULTS = REPO / "benchmarks" / "results"

# name -> (config overrides, int8?) — the distill-study student plus the
# stock small backbones a user would pick as distillation targets; the
# int8 row is the INTENDED serving config for the distilled student
# (accuracy gate: distill_accuracy.json student_distilled_int8)
_STUDENT = [
    "model.model_type=crnn",
    "model.crnn_cnn_channels=16,32",
    "model.crnn_rnn_hidden=64",
    "model.crnn_rnn_layers=1",
]
CONFIGS = {
    "resnet_conformer_flagship": ([], False),
    "crnn_reference": (["model.model_type=crnn"], False),
    "conformer_reference": (["model.model_type=conformer"], False),
    "crnn_student_16_32_64": (_STUDENT, False),
    "crnn_student_16_32_64_int8": (_STUDENT, True),
}


def measure(overrides, int8: bool = False) -> dict:
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.features import frame_signal
    from seld_tpu.models import build_model, init_variables
    from seld_tpu.ops.mel_pallas import log_mel_frames_pallas
    from seld_tpu.train.state import param_count

    cfg = parse_overrides(Config(), overrides)
    model = build_model(cfg.model, cfg.grid)

    def features(wave):  # (B, 4, N) -> (B, T, 4, 64)
        frames = frame_signal(wave, 960, 480)
        b, c, t, nf = frames.shape
        mel = log_mel_frames_pallas(frames.reshape(-1, nf))
        return jnp.transpose(mel.reshape(b, c, t, 64), (0, 2, 1, 3))[:, :WIN_FRAMES]

    rng = jax.random.PRNGKey(0)
    wave = jax.random.normal(rng, (BATCH, 4, N_SAMPLES), jnp.float32)
    variables = init_variables(
        model, rng, jnp.zeros((BATCH, WIN_FRAMES, 4, 64), jnp.float32)
    )
    n_params = sum(
        int(x.size) for x in jax.tree_util.tree_leaves(variables["params"])
    )
    if int8:
        from seld_tpu.quant import quantize_model, quantized_apply

        qt = quantize_model(model, variables, [features(wave)])
        apply_fn = lambda v, q, mel: quantized_apply(model, v, q, mel)  # noqa: E731
    else:
        qt = {}
        apply_fn = lambda v, q, mel: model.apply(v, mel, train=False)  # noqa: E731

    @jax.jit
    def chained(variables, qt, wave, n):
        def body(i, acc):
            w = wave + i.astype(jnp.float32) * 1e-6  # defeat CSE across iters
            out = apply_fn(variables, qt, features(w))
            return acc + out.astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    n_short, n_delta = 2, 20
    t0 = time.time()
    float(chained(variables, qt, wave, n_short))
    log(f"  compile+first: {time.time() - t0:.1f}s")

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
    return {
        "params": n_params,
        "ms_per_iter": round(per_iter * 1e3, 3),
        "ms_per_window": round(per_iter * 1e3 / BATCH, 4),
        "audio_s_per_s": round(thr, 1),
    }


def main():
    wait_for_accelerator()
    if jax.default_backend() != "tpu":
        raise RuntimeError(f"needs TPU, got {jax.default_backend()!r}")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    RESULTS.mkdir(exist_ok=True)
    results = {}
    for name, (over, int8) in CONFIGS.items():
        log(f"{name}:")
        results[name] = measure(over, int8=int8)
        log(f"  {json.dumps(results[name])}")
    flag = results["resnet_conformer_flagship"]["audio_s_per_s"]
    for name, r in results.items():
        r["vs_flagship"] = round(r["audio_s_per_s"] / flag, 2)
    # preserve the accuracy annotations distill_accuracy.py joins in
    out_f = RESULTS / "student_serving.json"
    if out_f.exists():
        prev = json.loads(out_f.read_text())
        for name, r in results.items():
            if name in prev and "accuracy" in prev[name]:
                r["accuracy"] = prev[name]["accuracy"]
    acc_f = RESULTS / "distill_accuracy.json"
    if acc_f.exists() and "crnn_student_16_32_64_int8" in results:
        acc = json.loads(acc_f.read_text()).get("student_distilled_int8")
        if acc:
            results["crnn_student_16_32_64_int8"]["accuracy"] = {
                "config": "student_distilled_int8",
                "F_macro": acc["F_macro"],
                "LE_macro": acc["LE_macro"],
                "SELD_error": acc["SELD_error"],
                "source": "distill_accuracy.json",
            }
    out_f.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
