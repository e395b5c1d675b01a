"""Pallas kernel correctness vs the jnp oracles (interpret mode on CPU;
the same kernels compile natively on TPU — exercised by bench_kernels.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.features import frame_signal, hann_window, log_mel_spectrogram
from seld_tpu.ops.mel_pallas import log_mel_frames_pallas

SR, NFFT, HOP, NMELS = 24_000, 960, 480, 64


def test_fused_mel_matches_oracle(rng):
    wave = rng.standard_normal(SR // 2).astype(np.float32)
    frames = frame_signal(jnp.asarray(wave), NFFT, HOP)  # (T, 960)

    got = np.asarray(log_mel_frames_pallas(frames, interpret=True))

    win = jnp.asarray(hann_window(NFFT))
    oracle = np.asarray(log_mel_spectrogram(jnp.asarray(wave))).T  # (T, n_mels)
    assert got.shape == oracle.shape
    # windowed-DFT matmul vs rFFT, both f32: tight agreement expected
    np.testing.assert_allclose(got, oracle, atol=5e-3)


def test_fused_mel_non_tile_multiple(rng):
    # 37 frames (not a multiple of the 256 tile) must round-trip the pad.
    frames = jnp.asarray(rng.standard_normal((37, NFFT)).astype(np.float32))
    got = log_mel_frames_pallas(frames, interpret=True)
    assert got.shape == (37, NMELS)
    assert bool(jnp.isfinite(got).all())


def test_fused_mel_silence_hits_amin():
    frames = jnp.zeros((8, NFFT), jnp.float32)
    got = np.asarray(log_mel_frames_pallas(frames, interpret=True))
    np.testing.assert_allclose(got, -100.0, atol=1e-4)  # 10*log10(1e-10)
