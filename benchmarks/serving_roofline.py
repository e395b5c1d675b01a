"""Serving roofline: is the 12.6k audio_s/s bf16 plateau speed-of-light?

Round-3 review #4: BENCH r01->r03 moved +0.9% over two rounds with no
roofline statement — no computed bf16 speed-of-light for the eval-mode
flagship that would justify either stopping or continuing to push.

This script computes it the same way train_profile.py did for the train
step (where the ~50% MFU claim comes from): XLA's own cost analysis of
the EXACT bench.py pipeline (features + eval-mode flagship forward at
batch 16 x 250-frame windows), divided by the v5e peak:

  * FLOPs come from jit(...).lower(args).compile().cost_analysis() on
    the CPU backend — HLO flop counts are dominated by the conv/matmul
    ops whose counts are backend-independent (the Pallas fused mel
    kernel the TPU path uses reports no flops anyway; the XLA rfft mel
    path stands in, and the front-end is also reported separately so
    the model-only bound brackets the answer);
  * v5e-1 peak: 197 TFLOP/s bf16, 394 TOP/s int8;
  * measured throughputs come from the committed benchmarks
    (bench_r3_final.json: 12,648 audio_s/s bf16; int8_serving.json:
    16,683 audio_s/s int8).

Output: per-window FLOPs, speed-of-light audio_s/s for bf16 and int8,
and the serving MFU at the measured numbers — the "number, not a
shrug" for docs/PERFORMANCE.md and BENCH_r04.

Runs on CPU (no chip needed): python benchmarks/serving_roofline.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

RESULTS = REPO / "benchmarks" / "results"
V5E_BF16_PEAK = 197e12
V5E_INT8_PEAK = 394e12
BATCH, WIN_FRAMES, WINDOW_S = 16, 250, 5.0
N_SAMPLES = 24000 * 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def flops_of(fn, *args) -> float:
    comp = jax.jit(fn).lower(*args).compile()
    (analysis,) = (
        comp.cost_analysis()
        if isinstance(comp.cost_analysis(), (list, tuple))
        else [comp.cost_analysis()]
    )
    return float(analysis["flops"])


def main():
    RESULTS.mkdir(exist_ok=True)
    from seld_tpu.config import Config
    from seld_tpu.features import log_mel_spectrogram
    from seld_tpu.models import build_model, init_variables

    cfg = Config()
    model = build_model(cfg.model, cfg.grid)

    def features(wave):  # (B, 4, N) -> (B, T, 4, 64), bench.py's XLA path
        mel = log_mel_spectrogram(wave)
        return jnp.transpose(mel, (0, 3, 1, 2))[:, :WIN_FRAMES]

    def model_fwd(variables, mel):
        return model.apply(variables, mel, train=False)

    def pipeline(variables, wave):
        return model_fwd(variables, features(wave))

    rng = jax.random.PRNGKey(0)
    wave = jnp.zeros((BATCH, 4, N_SAMPLES), jnp.float32)
    mel0 = jnp.zeros((BATCH, WIN_FRAMES, 4, 64), jnp.float32)
    variables = init_variables(model, rng, mel0)

    f_model = flops_of(model_fwd, variables, mel0)
    f_front = flops_of(features, wave)
    f_pipe = flops_of(pipeline, variables, wave)
    log(f"XLA flops @ b{BATCH}: model {f_model/1e12:.3f}T, "
        f"front-end {f_front/1e9:.2f}G, pipeline {f_pipe/1e12:.3f}T")

    per_window = f_pipe / BATCH
    sol_bf16 = V5E_BF16_PEAK / per_window * WINDOW_S   # audio_s/s
    sol_int8 = V5E_INT8_PEAK / per_window * WINDOW_S

    measured = {}
    bench_r3 = RESULTS / "bench_r3_final.json"
    if bench_r3.exists():
        measured["bf16"] = float(json.loads(bench_r3.read_text())["value"])
    int8_f = RESULTS / "int8_serving.json"
    if int8_f.exists():
        d = json.loads(int8_f.read_text())
        # int8_serving.json stores audio_s/s under its own schema
        for k in ("int8", "w8a8"):
            if k in d and isinstance(d[k], dict) and "audio_s_per_s" in d[k]:
                measured["int8"] = float(d[k]["audio_s_per_s"])
        if "int8" not in measured:
            flat = {k: v for k, v in d.items() if isinstance(v, (int, float))}
            log(f"int8_serving.json schema: {list(d)} (flat numerics {flat})")

    out = {
        "batch": BATCH,
        "window_frames": WIN_FRAMES,
        "window_seconds": WINDOW_S,
        "xla_flops_model_fwd": f_model,
        "xla_flops_frontend": f_front,
        "xla_flops_pipeline": f_pipe,
        "flops_per_window": per_window,
        "frontend_share": round(f_front / f_pipe, 4),
        "v5e_bf16_peak_flops": V5E_BF16_PEAK,
        "v5e_int8_peak_ops": V5E_INT8_PEAK,
        "speed_of_light_bf16_audio_s_per_s": round(sol_bf16, 1),
        "speed_of_light_int8_audio_s_per_s": round(sol_int8, 1),
    }
    for k, thr in measured.items():
        sol = sol_bf16 if k == "bf16" else sol_int8
        out[f"measured_{k}_audio_s_per_s"] = thr
        out[f"serving_mfu_{k}"] = round(thr / sol, 4)
        log(f"{k}: measured {thr:.0f} vs speed-of-light {sol:.0f} "
            f"audio_s/s -> serving MFU {thr / sol:.1%}")

    (RESULTS / "serving_roofline.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
