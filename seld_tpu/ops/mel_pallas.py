"""Fused Pallas TPU kernel: STFT frames -> log-mel, one pass through HBM.

The jnp front-end (seld_tpu.features.mel — the correctness oracle) runs
rFFT -> |.|^2 -> mel matmul -> log as separate XLA ops, materializing the
(T, 481) power spectrum in HBM. This kernel keeps a frame tile resident in
VMEM and does the whole chain on-chip:

  re  = frames_tile @ C_re      (MXU: windowed-DFT real part)
  im  = frames_tile @ C_im      (MXU: windowed-DFT imag part)
  mel = (re^2 + im^2) @ FB      (VPU square-add, MXU mel projection)
  out = 10 * log10(max(mel, amin))                 (VPU)

The Hann window is folded into the DFT matrices (C = win[:, None] * basis),
so framing outside the kernel stays a pure reshape. A DFT-as-matmul is
~38x the FLOPs of an FFT, but at n_fft=960 the MXU executes it far below
the HBM-bandwidth cost of the multi-pass FFT path — the kernel is
bandwidth-bound on the frame reads (see bench_kernels.py).

Dimensions are padded to TPU tiles: 481 freq bins -> 512 lanes (zero
columns), 64 mel bins -> 128 lanes (zero filterbank columns, sliced off
outside). n_fft=960 is sublane-aligned (960 % 8 == 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seld_tpu.features.mel import hann_window, mel_filterbank

TILE_T = 256
_FREQ_PAD = 512  # 481 -> 512 lanes
_MEL_PAD = 128  # 64 -> 128 lanes


@functools.lru_cache(maxsize=4)
def _dft_mel_constants(n_fft: int, n_mels: int, sample_rate: int):
    """(C_re, C_im, FB) float32, lane-padded, window folded into the DFT."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    win = hann_window(n_fft).astype(np.float64)[:, None]
    c_re = np.zeros((n_fft, _FREQ_PAD), np.float32)
    c_im = np.zeros((n_fft, _FREQ_PAD), np.float32)
    c_re[:, :n_freqs] = (win * np.cos(ang)).astype(np.float32)
    c_im[:, :n_freqs] = (win * np.sin(ang)).astype(np.float32)
    fb = np.zeros((_FREQ_PAD, _MEL_PAD), np.float32)
    fb[:n_freqs, :n_mels] = mel_filterbank(n_freqs, n_mels, sample_rate)
    return c_re, c_im, fb


def _kernel(frames_ref, c_re_ref, c_im_ref, fb_ref, out_ref, *, amin: float,
            precision):
    frames = frames_ref[:]
    re = jnp.dot(
        frames, c_re_ref[:], preferred_element_type=jnp.float32,
        precision=precision,
    )
    im = jnp.dot(
        frames, c_im_ref[:], preferred_element_type=jnp.float32,
        precision=precision,
    )
    power = re * re + im * im
    mel = jnp.dot(
        power, fb_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    # log10(x) = log2(x) / log2(10); padded lanes hit the amin clamp.
    out_ref[:] = (10.0 / np.log2(10.0)) * jnp.log2(jnp.maximum(mel, amin))


def log_mel_frames_pallas(
    frames,
    n_mels: int = 64,
    sample_rate: int = 24_000,
    amin: float = 1e-10,
    interpret: bool = False,
    precision=None,
):
    """(N, n_fft) float32 STFT frames -> (N, n_mels) float32 log-mel dB.

    Jittable; pads N up to the 256-frame tile internally.

    precision: MXU pass precision for the DFT matmuls. The default
    (fast bf16 passes) lands within 0.14 dB max / 0.007 dB mean of the
    f64 ground truth (measured on v5e) — pass
    jax.lax.Precision.HIGHEST for rfft-grade (~0.02 dB) at ~3x the
    matmul cost.
    """
    n, n_fft = frames.shape
    c_re, c_im, fb = _dft_mel_constants(n_fft, n_mels, sample_rate)

    n_pad = -(-n // TILE_T) * TILE_T
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))

    flops_per_tile = 2 * TILE_T * n_fft * _FREQ_PAD * 2 + 2 * TILE_T * _FREQ_PAD * _MEL_PAD
    out = pl.pallas_call(
        functools.partial(_kernel, amin=amin, precision=precision),
        grid=(n_pad // TILE_T,),
        in_specs=[
            pl.BlockSpec((TILE_T, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_FREQ_PAD, _MEL_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_T, _MEL_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, _MEL_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * (n_pad // TILE_T),
            bytes_accessed=n_pad * n_fft * 4 + n_pad * _MEL_PAD * 4,
            transcendentals=n_pad * _MEL_PAD,
        ),
        interpret=interpret,
    )(frames, jnp.asarray(c_re), jnp.asarray(c_im), jnp.asarray(fb))
    return out[:n, :n_mels]
