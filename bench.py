"""Benchmark: audio-seconds/sec/chip for features + inference (flagship).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_s/s/chip", "vs_baseline": N}

Pipeline measured (the BASELINE.json north-star workload): 5 s windows of
4-channel 24 kHz audio -> on-device log-mel front-end -> ResNet50-Conformer
forward (the reference's default model, ref config.py:39), end to end in
one jitted program.

Headline config (round 4): int8 w8a8 PTQ — the accuracy-gated production
serving configuration (argmax agreement 0.99997 in int8_accuracy.json;
full-scale DCASE-metric gate in flagship_synth_accuracy.json's best_int8
stage). The bf16 path is measured alongside and logged; if the int8
measurement fails for any reason the headline falls back to bf16.
Roofline context (benchmarks/serving_roofline.json): bf16 serving runs
at ~68% MFU of the v5e bf16 speed-of-light — the remaining share is the
profiled non-MXU conv padding/memory work — so the measured lever past
the bf16 plateau is int8's higher peak, not more bf16 fusion.

Baseline: the reference's own CPU throughput on identical shapes — its
torch ResNet50-Conformer forward (imported from /root/reference, CPU) plus
an equivalent numpy mel front-end (torchaudio is unavailable in this
image; the numpy oracle implements the same STFT+mel semantics). The
measured number is cached in BASELINE_CPU.json because the single-core
CPU pass is ~minutes; delete the file to re-measure.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent
CACHE = REPO / "BASELINE_CPU.json"

# Persistent XLA compile cache: repeat bench runs skip the ~4 min compile.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 16
WINDOW_S = 5.0
SR = 24_000
N_SAMPLES = int(WINDOW_S * SR)
WIN_FRAMES = 250


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_tpu() -> "tuple[float, float | None]":
    """Returns (bf16_audio_s_per_s, int8_audio_s_per_s_or_None).

    Timing methodology: the tunneled TPU backend's block_until_ready
    returns before remote execution finishes, so each measurement chains N
    pipeline iterations inside ONE jitted fori_loop (iteration-dependent
    inputs, output folded into a scalar carry so nothing can be elided)
    and syncs via a scalar host read-back. Throughput comes from the delta
    between a long and a short chain, cancelling the ~30 ms tunnel
    round-trip and dispatch overhead."""

    import jax
    import jax.numpy as jnp

    from seld_tpu.config import Config
    from seld_tpu.features import frame_signal, log_mel_spectrogram
    from seld_tpu.models import build_model, init_variables

    cfg = Config()
    model = build_model(cfg.model, cfg.grid)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from seld_tpu.ops.mel_pallas import log_mel_frames_pallas

    def features(wave):  # (B, 4, N) -> (B, T, 4, 64)
        if on_tpu:
            frames = frame_signal(wave, 960, 480)  # (B, 4, T, 960)
            b, c, t, nf = frames.shape
            mel = log_mel_frames_pallas(frames.reshape(-1, nf))
            mel = mel.reshape(b, c, t, 64)
            return jnp.transpose(mel, (0, 2, 1, 3))[:, :WIN_FRAMES]
        mel = log_mel_spectrogram(wave)  # (B, 4, 64, T)
        return jnp.transpose(mel, (0, 3, 1, 2))[:, :WIN_FRAMES]

    def chained_of(apply_fn):
        @jax.jit
        def chained(variables, qt, wave, n):  # n traced -> single compile
            def body(i, acc):
                w = wave + i.astype(jnp.float32) * 1e-6  # defeat CSE
                out = apply_fn(variables, qt, features(w))
                return acc + out.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        return chained

    rng = jax.random.PRNGKey(0)
    wave = jax.random.normal(rng, (BATCH, 4, N_SAMPLES), jnp.float32)
    mel0 = jnp.zeros((BATCH, WIN_FRAMES, 4, 64), jnp.float32)
    variables = init_variables(model, rng, mel0)

    n_short, n_delta = 2, 20

    def measure_variant(name, chained, qt):
        t0 = time.time()
        float(chained(variables, qt, wave, n_short))
        log(f"tpu[{name}] compile+first: {time.time() - t0:.2f}s")

        def timed(n, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                float(chained(variables, qt, wave, n))  # scalar = true sync
                best = min(best, time.time() - t0)
            return best

        t_short = timed(n_short)
        t_long = timed(n_short + n_delta)
        per_iter = (t_long - t_short) / n_delta
        thr = BATCH * WINDOW_S / per_iter
        log(
            f"tpu[{name}]: short({n_short})={t_short * 1e3:.1f}ms "
            f"long({n_short + n_delta})={t_long * 1e3:.1f}ms -> "
            f"{per_iter * 1e3:.2f} ms/iter ({BATCH} windows) -> "
            f"{thr:.1f} audio_s/s/chip"
        )
        return thr

    thr_bf16 = measure_variant(
        "bf16",
        chained_of(lambda v, q, mel: model.apply(v, mel, train=False)),
        (),
    )
    thr_int8 = None
    if on_tpu:
        # int8 w8a8 PTQ headline (accuracy-gated; see module docstring).
        # Any failure falls back to the bf16 headline — the bench must
        # never die on the headline-promotion path.
        try:
            from seld_tpu.quant import quantize_model, quantized_apply

            calib = features(wave)
            qt = quantize_model(model, variables, [calib])
            thr_int8 = measure_variant(
                "int8",
                chained_of(
                    lambda v, q, mel: quantized_apply(model, v, q, mel)
                ),
                qt,
            )
        except Exception as e:  # noqa: BLE001 — headline fallback by design
            log(f"int8 measurement failed ({e!r}); bf16 headline")
    return thr_bf16, thr_int8


def measure_cpu_reference() -> float:
    """Reference pipeline on CPU: torch ResNet50-Conformer forward +
    numpy mel front-end at the same per-window shapes."""
    existing = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    if "audio_s_per_s" in existing:
        log(f"cpu baseline (cached): {existing['audio_s_per_s']:.3f} audio_s/s")
        return existing["audio_s_per_s"]

    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from resnet50_model import SELD_ResNet50_Conformer
    finally:
        sys.path.remove("/root/reference")

    model = SELD_ResNet50_Conformer().eval()

    # features: numpy STFT+mel with identical semantics (1 window, 4 ch)
    from seld_tpu.features import hann_window, mel_filterbank

    wave = np.random.default_rng(0).standard_normal((4, N_SAMPLES)).astype(np.float32)
    win = hann_window(960)
    fb = mel_filterbank(481, 64, SR)

    def numpy_mel(w):
        pad = 480
        x = np.pad(w, ((0, 0), (pad, pad)), mode="reflect")
        t_frames = 1 + w.shape[1] // 480
        idx = np.arange(960)[None, :] + 480 * np.arange(t_frames)[:, None]
        frames = x[:, idx] * win  # (4, T, 960)
        spec = np.fft.rfft(frames, axis=-1)
        power = np.abs(spec) ** 2
        return 10.0 * np.log10(np.maximum(power @ fb, 1e-10))

    t0 = time.time()
    mel = numpy_mel(wave)
    feat_time = time.time() - t0
    log(f"cpu features: {feat_time:.3f}s / window")

    x = torch.from_numpy(
        mel[:, :WIN_FRAMES].transpose(1, 0, 2)[None].astype(np.float32)
    )  # (1, 250, 4, 64)
    with torch.no_grad():
        t0 = time.time()
        model(x)
        first = time.time() - t0
        iters = 2
        t0 = time.time()
        for _ in range(iters):
            model(x)
        fwd_time = (time.time() - t0) / iters
    log(f"cpu forward: first {first:.2f}s, steady {fwd_time:.3f}s / window")

    thr = WINDOW_S / (fwd_time + feat_time)
    # Merge into any existing cache contents (e.g. the per-backbone
    # baseline section) instead of clobbering them.
    existing.update(
        {
            "audio_s_per_s": thr,
            "forward_s_per_window": fwd_time,
            "features_s_per_window": feat_time,
            "window_s": WINDOW_S,
            "note": "reference torch ResNet50-Conformer fwd + numpy mel, "
            "single CPU core, shapes (1,250,4,64)",
        }
    )
    CACHE.write_text(json.dumps(existing, indent=2))
    log(f"cpu baseline: {thr:.3f} audio_s/s (cached to {CACHE.name})")
    return thr


def wait_for_accelerator(max_wait_s: float = 2700.0) -> None:
    """The tunneled TPU grant can be briefly unavailable (e.g. right after
    a killed client; the stale lease must time out — measured wedges run
    25-35 min, so the default budget covers a full one). Probe with short
    subprocess attempts — a hung in-process backend init can't be
    interrupted — until a trivial op succeeds."""
    import subprocess

    deadline = time.time() + max_wait_s
    probe = (
        "import jax, jax.numpy as jnp;"
        "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))"
    )
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", probe],
                timeout=90, check=True, capture_output=True,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            if time.time() > deadline:
                raise TimeoutError(
                    f"accelerator unavailable after {max_wait_s}s"
                ) from e
            log(f"accelerator probe {attempt} failed; retrying...")
            time.sleep(20)


def main():
    wait_for_accelerator()
    import jax as _jax

    backend = _jax.default_backend()
    if backend != "tpu" and os.environ.get("SELD_BENCH_ALLOW_CPU") != "1":
        # Never let a silent CPU fallback (e.g. the PYTHONPATH-clobbered
        # plugin registration) masquerade as a chip throughput number.
        raise RuntimeError(
            f"bench requires the TPU backend, got {backend!r} "
            "(set SELD_BENCH_ALLOW_CPU=1 to measure CPU explicitly)"
        )
    thr_bf16, thr_int8 = measure_tpu()
    if thr_int8 is not None and thr_int8 > thr_bf16:
        tpu, variant = thr_int8, (
            "int8 w8a8 PTQ (accuracy-gated; "
            f"bf16 {round(thr_bf16, 1)})"
        )
    else:
        tpu, variant = thr_bf16, "bf16"
    try:
        cpu = measure_cpu_reference()
        ratio = tpu / cpu if cpu > 0 else float("nan")
    except Exception as e:  # baseline is best-effort; the TPU number stands
        log(f"cpu baseline failed: {e}")
        ratio = float("nan")
    print(
        json.dumps(
            {
                "metric": "audio-sec/sec/chip, features+inference, "
                f"ResNet50-Conformer {variant}, batch 16 x 5s windows",
                "value": round(tpu, 2),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(ratio, 2) if np.isfinite(ratio) else None,
            }
        )
    )


if __name__ == "__main__":
    main()
