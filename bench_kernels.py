"""Kernel microbenchmarks on the real TPU (diagnostic; the driver-facing
benchmark is bench.py). Uses the chained-fori timing methodology from
bench.py (scalar read-back sync; long-minus-short delta)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_chain(fn_body, n_short=2, n_delta=30, reps=3):
    """fn_body(i, acc) -> acc. Returns seconds per iteration."""

    @jax.jit
    def chained(n):
        return jax.lax.fori_loop(0, n, fn_body, jnp.zeros((), jnp.float32))

    float(chained(n_short))  # compile + warm

    def t(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(chained(n))
            best = min(best, time.time() - t0)
        return best

    return (t(n_short + n_delta) - t(n_short)) / n_delta


def main():
    from seld_tpu.features import frame_signal
    from seld_tpu.features.mel import hann_window, mel_filterbank
    from seld_tpu.ops.mel_pallas import log_mel_frames_pallas

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)

    # ---- fused mel kernel vs rfft path, 60 s of 4-ch audio per iter ----
    seconds = 60
    wave = jax.random.normal(jax.random.PRNGKey(0), (4, seconds * 24_000), jnp.float32)
    frames = frame_signal(wave, 960, 480)  # (4, T, 960)
    flat = frames.reshape(-1, 960)
    n_frames = flat.shape[0]

    def pallas_body(i, acc):
        out = log_mel_frames_pallas(flat + i.astype(jnp.float32) * 1e-9)
        return acc + out.mean()

    win = jnp.asarray(hann_window(960))
    fb = jnp.asarray(mel_filterbank(481, 64, 24_000))

    def rfft_body(i, acc):
        f = flat + i.astype(jnp.float32) * 1e-9
        spec = jnp.fft.rfft(f * win, axis=-1)
        power = jnp.square(spec.real) + jnp.square(spec.imag)
        mel = power @ fb
        return acc + (10.0 * jnp.log10(jnp.maximum(mel, 1e-10))).mean()

    # numerical agreement on-device
    a = np.asarray(log_mel_frames_pallas(flat))
    spec = jnp.fft.rfft(flat * win, axis=-1)
    b = np.asarray(10.0 * jnp.log10(jnp.maximum(
        (jnp.square(spec.real) + jnp.square(spec.imag)) @ fb, 1e-10)))
    print(f"mel pallas-vs-rfft max|diff|: {np.abs(a - b).max():.2e} dB",
          file=sys.stderr)

    t_pallas = timed_chain(pallas_body)
    t_rfft = timed_chain(rfft_body)
    audio_s = 4 * seconds  # per-channel audio seconds processed
    print(
        f"fused mel pallas: {t_pallas * 1e3:.3f} ms/iter "
        f"({n_frames} frames, {audio_s / t_pallas:.0f} ch-audio-s/s)",
        file=sys.stderr,
    )
    print(
        f"rfft+matmul path: {t_rfft * 1e3:.3f} ms/iter "
        f"({audio_s / t_rfft:.0f} ch-audio-s/s)",
        file=sys.stderr,
    )
    print(f"speedup pallas/rfft: {t_rfft / t_pallas:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
