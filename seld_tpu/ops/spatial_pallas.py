"""Fused Pallas TPU kernel: the full spatial front-end in one HBM pass.

The BASELINE.json north-star asks for "rFFT + mel matmul + cross-spectrum
phase in one pass through HBM". This kernel delivers exactly that: for a
tile of STFT frames of all 4 FOA channels resident in VMEM it computes

  * per-channel windowed DFT (MXU matmuls against cos/sin bases),
  * 4x log-mel bands (power -> mel matmul -> log, as ops.mel_pallas),
  * optionally 3 FOA intensity-vector channels
    (Re{conj(W) . [X,Y,Z]} / energy, mel-banded), and
  * optionally 6 GCC-PHAT channels (PHAT-normalized cross-spectra
    projected straight onto the 64 centered lags with an inverse-DFT
    matrix — only the needed lags are ever computed),

writing a single (T, C_out, n_mels) feature stack. The jnp implementation
(seld_tpu.features.spatial) is the correctness oracle.

Frequency dims are lane-padded 481 -> 512 with zero DFT columns: padded
bins produce zero cross-spectra (0 * 1/eps = 0 after PHAT), zero
mel/lag-matrix rows, and no energy, so results are exact.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seld_tpu.features.mel import hann_window, mel_filterbank
from seld_tpu.features.spatial import feature_channels

TILE_T = 128
_FREQ_PAD = 512
_OUT_PAD = 128  # n_mels / n_lags lane pad
_ACN_W, _ACN_Y, _ACN_Z, _ACN_X = 0, 1, 2, 3
_PAIRS = list(itertools.combinations(range(4), 2))


@functools.lru_cache(maxsize=4)
def _constants(n_fft: int, n_mels: int, sample_rate: int):
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    win = hann_window(n_fft).astype(np.float64)[:, None]
    c_re = np.zeros((n_fft, _FREQ_PAD), np.float32)
    c_im = np.zeros((n_fft, _FREQ_PAD), np.float32)
    c_re[:, :n_freqs] = (win * np.cos(ang)).astype(np.float32)
    c_im[:, :n_freqs] = (win * np.sin(ang)).astype(np.float32)

    fb = np.zeros((_FREQ_PAD, _OUT_PAD), np.float32)
    fb[:n_freqs, :n_mels] = mel_filterbank(n_freqs, n_mels, sample_rate)
    fb_norm = np.zeros_like(fb)
    denom = np.maximum(fb.sum(axis=0, keepdims=True), 1e-8)
    fb_norm[:, :n_mels] = (fb / denom)[:, :n_mels]

    # Inverse-rDFT onto the n_mels centered lags m in [-n_mels//2, ...):
    # corr[m] = (1/N) sum_k w_k (Re R_k cos(2 pi k m / N)
    #                            - Im R_k sin(2 pi k m / N)),
    # w_k = 2 except w_0 = w_{N/2} = 1 (one-sided spectrum expansion).
    half = n_mels // 2
    lags = np.concatenate([np.arange(-half, 0), np.arange(0, n_mels - half)])
    kk = np.arange(n_freqs, dtype=np.float64)[:, None]
    mm = lags[None, :].astype(np.float64)
    w = np.full((n_freqs, 1), 2.0)
    w[0, 0] = 1.0
    if n_fft % 2 == 0:
        w[-1, 0] = 1.0
    phase = 2.0 * np.pi * kk * mm / n_fft
    lag_re = np.zeros((_FREQ_PAD, _OUT_PAD), np.float32)
    lag_im = np.zeros((_FREQ_PAD, _OUT_PAD), np.float32)
    # lag order in output: index l corresponds to lag l - half (centered),
    # matching features.spatial.gcc_phat_features' concatenation.
    lag_re[:n_freqs, :n_mels] = (w * np.cos(phase) / n_fft).astype(np.float32)
    lag_im[:n_freqs, :n_mels] = (-w * np.sin(phase) / n_fft).astype(np.float32)
    return c_re, c_im, fb, fb_norm, lag_re, lag_im


def _kernel(frames_ref, c_re_ref, c_im_ref, fb_ref, fbn_ref, lre_ref, lim_ref,
            out_ref, *, amin: float, include_iv: bool, include_gcc: bool,
            eps: float):
    c_re, c_im = c_re_ref[:], c_im_ref[:]
    re, im = [], []
    for ch in range(4):
        f = frames_ref[ch]
        re.append(jnp.dot(f, c_re, preferred_element_type=jnp.float32))
        im.append(jnp.dot(f, c_im, preferred_element_type=jnp.float32))

    fb = fb_ref[:]
    row = 0
    for ch in range(4):  # log-mel channels
        power = re[ch] * re[ch] + im[ch] * im[ch]
        mel = jnp.dot(power, fb, preferred_element_type=jnp.float32)
        out_ref[:, row, :] = (10.0 / np.log2(10.0)) * jnp.log2(
            jnp.maximum(mel, amin)
        )
        row += 1

    if include_iv:
        fbn = fbn_ref[:]
        pw = re[_ACN_W] * re[_ACN_W] + im[_ACN_W] * im[_ACN_W]
        p_xyz = [
            re[c] * re[c] + im[c] * im[c] for c in (_ACN_X, _ACN_Y, _ACN_Z)
        ]
        energy = (pw + (p_xyz[0] + p_xyz[1] + p_xyz[2]) / 3.0) / 2.0 + eps
        inv_e = 1.0 / energy
        for c in (_ACN_X, _ACN_Y, _ACN_Z):
            intensity = re[_ACN_W] * re[c] + im[_ACN_W] * im[c]
            out_ref[:, row, :] = jnp.dot(
                intensity * inv_e, fbn, preferred_element_type=jnp.float32
            )
            row += 1

    if include_gcc:
        lre, lim = lre_ref[:], lim_ref[:]
        for i, j in _PAIRS:
            # conj(S_i) * S_j
            cr = re[i] * re[j] + im[i] * im[j]
            ci = re[i] * im[j] - im[i] * re[j]
            inv = jax.lax.rsqrt(cr * cr + ci * ci + eps * eps)
            out_ref[:, row, :] = jnp.dot(
                cr * inv, lre, preferred_element_type=jnp.float32
            ) + jnp.dot(ci * inv, lim, preferred_element_type=jnp.float32)
            row += 1


def spatial_features_pallas(
    frames,
    feature_set: str = "mel_gcc",
    n_mels: int = 64,
    sample_rate: int = 24_000,
    amin: float = 1e-10,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """(4, T, n_fft) float32 frames -> (T, C_out, n_mels) feature stack.

    One fused HBM pass; C_out = 4 ("mel"), 7 ("mel_iv") or 10 ("mel_gcc").
    """
    c, t, n_fft = frames.shape
    assert c == 4, "spatial features require 4-channel FOA input"
    include_iv = feature_set == "mel_iv"
    include_gcc = feature_set == "mel_gcc"
    c_out = feature_channels(feature_set, 4)

    consts = _constants(n_fft, n_mels, sample_rate)
    t_pad = -(-t // TILE_T) * TILE_T
    if t_pad != t:
        frames = jnp.pad(frames, ((0, 0), (0, t_pad - t), (0, 0)))

    const_spec = pl.BlockSpec(
        (n_fft, _FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    proj_spec = pl.BlockSpec(
        (_FREQ_PAD, _OUT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, amin=amin, include_iv=include_iv,
            include_gcc=include_gcc, eps=eps,
        ),
        grid=(t_pad // TILE_T,),
        in_specs=[
            pl.BlockSpec((4, TILE_T, n_fft), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            const_spec, const_spec, proj_spec, proj_spec, proj_spec, proj_spec,
        ],
        out_specs=pl.BlockSpec(
            (TILE_T, c_out, _OUT_PAD), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, c_out, _OUT_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * n_fft * _FREQ_PAD * 8
            + 2 * t_pad * _FREQ_PAD * _OUT_PAD * (4 + 3 * include_iv + 12 * include_gcc),
            bytes_accessed=4 * t_pad * n_fft * 4 + t_pad * c_out * _OUT_PAD * 4,
            transcendentals=t_pad * _OUT_PAD * 4,
        ),
        interpret=interpret,
    )(frames, *[jnp.asarray(x) for x in consts])
    return out[:t, :, :n_mels]
