"""Spatial feature extraction: FOA intensity vectors and GCC-PHAT.

The reference's only features are per-channel log-mels (SURVEY C6: no
GCC-PHAT, no intensity vectors anywhere in the repo). BASELINE.json's
north-star asks for them, and they are the standard DCASE SELD spatial
features, so seld_tpu provides them as selectable front-end feature sets
(FeatureConfig.feature_set):

  * "mel"     — 4 log-mel channels (reference parity)
  * "mel_iv"  — + 3 FOA intensity-vector channels (7 total). The acoustic
    intensity in ACN-ordered FOA (W, Y, Z, X) is
    I(t,f) = Re{ conj(W) * [X, Y, Z] }, normalized by the total energy
    per TF bin and aggregated onto the mel bands (Cao et al. 2019 /
    DCASE SELD baselines).
  * "mel_gcc" — + 6 GCC-PHAT channels, one per mic pair (10 total):
    R_ij = S_i conj(S_j) / |S_i conj(S_j)|, inverse-FFT to the lag
    domain, keeping n_mels lags centered on zero.

Everything is jittable and shares the framing/window/mel machinery of
seld_tpu.features.mel; the corpus builder runs it in fixed-shape device
chunks.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

from seld_tpu.features.mel import hann_window, mel_filterbank

# STARSS22 FOA is ACN channel order: W, Y, Z, X.
_ACN_W, _ACN_Y, _ACN_Z, _ACN_X = 0, 1, 2, 3

FEATURE_CHANNELS = {"mel": 4, "mel_iv": 7, "mel_gcc": 10}


def feature_channels(feature_set: str, n_audio_channels: int = 4) -> int:
    """Total feature channels produced for a feature set."""
    if feature_set == "mel":
        return n_audio_channels
    if feature_set == "mel_iv":
        return n_audio_channels + 3
    if feature_set == "mel_gcc":
        n_pairs = n_audio_channels * (n_audio_channels - 1) // 2
        return n_audio_channels + n_pairs
    raise ValueError(f"unknown feature_set {feature_set!r}")


def stft_frames(frames, n_fft: int):
    """Windowed rFFT of pre-framed audio: (..., T, n_fft) -> complex
    (..., T, n_fft//2+1)."""
    window = jnp.asarray(hann_window(n_fft))
    return jnp.fft.rfft(frames * window, axis=-1)


def log_mel_from_spec(spec, n_mels: int, sample_rate: int, amin: float = 1e-10):
    """Power of a complex spectrum -> log-mel dB: (..., T, F) -> (..., T, n_mels)."""
    power = jnp.square(spec.real) + jnp.square(spec.imag)
    fb = jnp.asarray(mel_filterbank(spec.shape[-1], n_mels, sample_rate))
    return 10.0 * jnp.log10(jnp.maximum(power.astype(jnp.float32) @ fb, amin))


def foa_intensity_mel(spec, n_mels: int, sample_rate: int, eps: float = 1e-8):
    """FOA acoustic intensity vector on mel bands.

    spec: complex (4, T, F) in ACN order (W, Y, Z, X).
    Returns float32 (T, 3, n_mels), ordered (X, Y, Z) components, each in
    [-1, 1] (energy-normalized per TF bin, mel-banded).
    """
    w = spec[_ACN_W]
    xyz = jnp.stack([spec[_ACN_X], spec[_ACN_Y], spec[_ACN_Z]])  # (3, T, F)
    intensity = (jnp.conj(w)[None] * xyz).real  # (3, T, F)
    energy = (
        jnp.square(jnp.abs(w))
        + jnp.mean(jnp.square(jnp.abs(xyz)), axis=0)
    ) / 2.0 + eps
    normed = intensity / energy[None]
    fb = jnp.asarray(mel_filterbank(spec.shape[-1], n_mels, sample_rate))
    fb_norm = fb / jnp.maximum(fb.sum(axis=0, keepdims=True), eps)  # banded mean
    iv_mel = normed.astype(jnp.float32) @ fb_norm  # (3, T, n_mels)
    return jnp.transpose(iv_mel, (1, 0, 2))  # (T, 3, n_mels)


def gcc_phat_features(spec, n_lags: int, eps: float = 1e-8):
    """GCC-PHAT lag features for every channel pair.

    spec: complex (C, T, F) one-sided spectra of n_fft-framed audio.
    Returns float32 (T, C*(C-1)//2, n_lags): inverse rFFT of the
    phase-transformed cross-spectrum, keeping lags [-n_lags//2,
    n_lags//2) centered on zero delay.
    """
    c = spec.shape[0]
    pairs = list(itertools.combinations(range(c), 2))
    i_idx = jnp.asarray([p[0] for p in pairs])
    j_idx = jnp.asarray([p[1] for p in pairs])
    # conj(S_i) * S_j: positive lag <=> channel j delayed relative to i
    cross = jnp.conj(spec[i_idx]) * spec[j_idx]  # (P, T, F)
    cross = cross / jnp.maximum(jnp.abs(cross), eps)
    corr = jnp.fft.irfft(cross, axis=-1)  # (P, T, n_fft) lag domain
    half = n_lags // 2
    centered = jnp.concatenate(
        [corr[..., -half:], corr[..., : n_lags - half]], axis=-1
    )  # lags -half .. n_lags-half-1
    return jnp.transpose(centered.astype(jnp.float32), (1, 0, 2))  # (T, P, L)


def extract_feature_frames(frames, feature_set: str, n_fft: int, n_mels: int,
                           sample_rate: int, amin: float = 1e-10):
    """Framed audio (C, T, n_fft) -> (T, C_out, n_mels) feature stack."""
    spec = stft_frames(frames, n_fft)  # (C, T, F)
    logmel = log_mel_from_spec(spec, n_mels, sample_rate, amin)  # (C, T, n_mels)
    feats = [jnp.transpose(logmel, (1, 0, 2))]  # (T, C, n_mels)
    if feature_set == "mel_iv":
        feats.append(foa_intensity_mel(spec, n_mels, sample_rate))
    elif feature_set == "mel_gcc":
        feats.append(gcc_phat_features(spec, n_lags=n_mels))
    elif feature_set != "mel":
        raise ValueError(f"unknown feature_set {feature_set!r}")
    return jnp.concatenate(feats, axis=1)  # (T, C_out, n_mels)
