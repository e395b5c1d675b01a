"""Feature front-end tests: numerical parity with an independent numpy
STFT oracle implementing the documented torch/torchaudio semantics
(ref dataset.py:27-58; torchaudio MelSpectrogram + AmplitudeToDB defaults),
plus analytic sanity checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.features import (
    amplitude_to_db,
    frame_signal,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    num_stft_frames,
)

SR, NFFT, HOP, NMELS = 24_000, 960, 480, 64


def oracle_log_mel(wave: np.ndarray) -> np.ndarray:
    """Independent numpy implementation of the contract: center/reflect
    pad, periodic hann, rFFT power, HTK mel (norm=None), 10*log10."""
    pad = NFFT // 2
    x = np.pad(wave, pad, mode="reflect")
    t_frames = 1 + len(wave) // HOP
    win = hann_window(NFFT).astype(np.float64)
    frames = np.stack(
        [x[t * HOP : t * HOP + NFFT] for t in range(t_frames)]
    ).astype(np.float64)
    spec = np.fft.rfft(frames * win, axis=-1)
    power = np.abs(spec) ** 2
    fb = mel_filterbank(NFFT // 2 + 1, NMELS, SR).astype(np.float64)
    mel = power @ fb
    return (10.0 * np.log10(np.maximum(mel, 1e-10))).T  # (n_mels, T)


def test_frame_count():
    assert num_stft_frames(24_000, HOP) == 51
    assert num_stft_frames(24_000 - 1, HOP) == 50
    assert num_stft_frames(60 * SR, HOP) == 3001


def test_frame_signal_matches_oracle(rng):
    n = SR  # 1 s
    wave = rng.standard_normal(n).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(wave), NFFT, HOP))
    pad = NFFT // 2
    xp = np.pad(wave, pad, mode="reflect")
    t_frames = 1 + n // HOP
    for t in [0, 1, 17, t_frames - 1]:
        np.testing.assert_allclose(frames[t], xp[t * HOP : t * HOP + NFFT], rtol=0)


def test_frame_signal_nondivisible_length(rng):
    n = SR + 123  # not a multiple of hop
    wave = rng.standard_normal(n).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(wave), NFFT, HOP))
    assert frames.shape == (1 + n // HOP, NFFT)
    pad = NFFT // 2
    xp = np.pad(wave, pad, mode="reflect")
    t = frames.shape[0] - 1
    seg = xp[t * HOP : t * HOP + NFFT]
    np.testing.assert_allclose(frames[t, : len(seg)], seg, rtol=0)


def test_mel_filterbank_properties():
    fb = mel_filterbank(NFFT // 2 + 1, NMELS, SR)
    assert fb.shape == (481, 64)
    assert fb.min() >= 0.0
    # HTK peaks are 1.0 only when a linear bin lands on a breakpoint;
    # all filters must be nonzero and bounded by 1.
    assert fb.max() <= 1.0 + 1e-6
    assert (fb.sum(axis=0) > 0).all()
    # Triangle peak location: filter m peaks near mel breakpoint m+1.
    peak_bins = fb.argmax(axis=0)
    assert (np.diff(peak_bins) > 0).all()  # monotonically increasing centers


def test_log_mel_matches_numpy_oracle(rng):
    wave = rng.standard_normal(SR).astype(np.float32)  # 1 s mono
    got = np.asarray(log_mel_spectrogram(jnp.asarray(wave), SR, NFFT, HOP, NMELS))
    want = oracle_log_mel(wave)
    assert got.shape == want.shape == (NMELS, 51)
    # f32 device FFT vs f64 oracle: observed max ~0.023 dB on 25 dB values
    # (torchaudio itself computes in f32, so this bounds the parity gap).
    np.testing.assert_allclose(got, want, rtol=0, atol=0.05)


def test_log_mel_multichannel_vectorized(rng):
    # 4-channel FOA clip: output (4, n_mels, T), channels independent
    # (the reference loops channels; ours is one vectorized call).
    wave = rng.standard_normal((4, SR // 2)).astype(np.float32)
    got = np.asarray(log_mel_spectrogram(jnp.asarray(wave)))
    assert got.shape == (4, NMELS, 1 + wave.shape[1] // HOP)
    solo = np.asarray(log_mel_spectrogram(jnp.asarray(wave[2])))
    np.testing.assert_allclose(got[2], solo, atol=1e-5)


def test_pure_tone_lands_in_correct_mel_bin():
    # A sine at bin-center frequency concentrates energy in the matching
    # mel filter.
    f0 = 3000.0
    t = np.arange(SR, dtype=np.float64) / SR
    wave = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    mel_db = np.asarray(log_mel_spectrogram(jnp.asarray(wave)))
    mean_db = mel_db.mean(axis=1)
    fb = mel_filterbank(NFFT // 2 + 1, NMELS, SR)
    freqs = np.linspace(0, SR / 2, NFFT // 2 + 1)
    expected_bin = fb[np.argmin(np.abs(freqs - f0))].argmax()
    assert abs(int(mean_db.argmax()) - int(expected_bin)) <= 1


def test_amplitude_to_db_semantics():
    x = jnp.asarray([1.0, 100.0, 0.0, 1e-12])
    db = np.asarray(amplitude_to_db(x))
    np.testing.assert_allclose(db, [0.0, 20.0, -100.0, -100.0], atol=1e-3)
    # top_db clamps relative to max
    db2 = np.asarray(amplitude_to_db(x, top_db=40.0))
    np.testing.assert_allclose(db2, [0.0, 20.0, -20.0, -20.0], atol=1e-3)


def test_log_mel_is_jittable(rng):
    wave = jnp.asarray(rng.standard_normal((4, SR // 4)).astype(np.float32))
    f = jax.jit(log_mel_spectrogram)
    np.testing.assert_allclose(
        np.asarray(f(wave)), np.asarray(log_mel_spectrogram(wave)), atol=1e-4
    )
