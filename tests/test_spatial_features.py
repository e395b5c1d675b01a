"""Spatial feature tests: FOA intensity vectors point toward the source,
GCC-PHAT peaks at the true inter-channel lag, and the feature sets flow
through corpus + training."""

import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.features.spatial import (
    extract_feature_frames,
    feature_channels,
    foa_intensity_mel,
    gcc_phat_features,
    stft_frames,
)

SR, NFFT, HOP = 24_000, 960, 480


def foa_plane_wave(az_deg, el_deg, seconds=0.5, f0=1000.0):
    """ACN-ordered (W, Y, Z, X) FOA encoding of a plane wave from
    (az, el), N3D/SN3D scale factors irrelevant for direction tests."""
    t = np.arange(int(seconds * SR)) / SR
    s = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    az, el = np.deg2rad(az_deg), np.deg2rad(el_deg)
    w = s
    x = np.cos(el) * np.cos(az) * s
    y = np.cos(el) * np.sin(az) * s
    z = np.sin(el) * s
    return np.stack([w, y, z, x])  # ACN order


def frames_of(wave):
    from seld_tpu.data.corpus import _frame_view

    return jnp.asarray(np.ascontiguousarray(_frame_view(wave, NFFT, HOP)))


def test_feature_channels():
    assert feature_channels("mel") == 4
    assert feature_channels("mel_iv") == 7
    assert feature_channels("mel_gcc") == 10
    with pytest.raises(ValueError):
        feature_channels("nope")


@pytest.mark.parametrize(
    "az,el,signs",
    [
        (0, 0, (+1, 0, 0)),  # front: +X, ~0 Y, ~0 Z
        (90, 0, (0, +1, 0)),  # left: +Y
        (0, 90, (0, 0, +1)),  # up: +Z
        (180, 0, (-1, 0, 0)),  # back: -X
        (-90, -45, None),  # mixed: check against analytic direction
    ],
)
def test_intensity_vector_points_at_source(az, el, signs):
    wave = foa_plane_wave(az, el)
    spec = stft_frames(frames_of(wave), NFFT)
    iv = np.asarray(foa_intensity_mel(spec, 64, SR))  # (T, 3, n_mels)
    # average over active TF region (dominant mel band)
    band = np.abs(iv).sum(axis=(0, 1)).argmax()
    v = iv[:, :, band].mean(axis=0)  # (X, Y, Z)
    v = v / (np.linalg.norm(v) + 1e-9)
    azr, elr = np.deg2rad(az), np.deg2rad(el)
    expect = np.array(
        [np.cos(elr) * np.cos(azr), np.cos(elr) * np.sin(azr), np.sin(elr)]
    )
    # intensity direction equals the source DOA (up to sign convention)
    assert float(np.dot(v, expect)) > 0.95


def test_gcc_phat_peak_at_true_lag():
    rng = np.random.default_rng(0)
    n = SR // 2
    base = rng.standard_normal(n + 64).astype(np.float32)
    delay = 7  # samples: ch_j lags ch_i by 7 -> peak at +7
    wave = np.stack(
        [base[64 : 64 + n], base[64 - delay : 64 - delay + n],
         rng.standard_normal(n).astype(np.float32),
         rng.standard_normal(n).astype(np.float32)]
    )
    spec = stft_frames(frames_of(wave), NFFT)
    gcc = np.asarray(gcc_phat_features(spec, n_lags=64))  # (T, 6, 64)
    pair01 = gcc[:, 0]  # pair (0, 1); lag axis is [-32..31] -> index = lag+32
    peak = pair01.mean(axis=0).argmax()
    assert peak == 32 + delay


def test_extract_feature_frames_shapes():
    wave = foa_plane_wave(30, 10, seconds=0.3)
    frames = frames_of(wave)
    for fs in ("mel", "mel_iv", "mel_gcc"):
        out = extract_feature_frames(frames, fs, NFFT, 64, SR)
        assert out.shape == (frames.shape[1], feature_channels(fs), 64)
        assert bool(jnp.isfinite(out).all())
    # log-mel channels identical across feature sets
    a = extract_feature_frames(frames, "mel", NFFT, 64, SR)
    b = extract_feature_frames(frames, "mel_iv", NFFT, 64, SR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b[:, :4]), atol=1e-5)


def test_corpus_and_training_with_spatial_features(tmp_path):
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.train import train_model
    from tests.test_train import tiny_config

    cfg = tiny_config(tmp_path).replace_path("features.feature_set", "mel_iv")
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    assert train_c.mel.shape[1] == 7  # 4 mel + 3 intensity
    state, history = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert np.isfinite(history["train_losses"][-1])
