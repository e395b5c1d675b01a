"""Data layer tests: WAV round-trip, discovery pairing, corpus windowing
arithmetic, device-mel == jnp-oracle parity, batch iteration."""

from pathlib import Path

import numpy as np
import pytest

from seld_tpu.config import Config, DataConfig
from seld_tpu.data import (
    BatchIterator,
    build_corpus,
    discover_files,
    load_wav,
    synthetic_corpus,
    synthetic_raw_files,
)
from seld_tpu.data.audio import write_wav
from seld_tpu.data.corpus import compute_mel_features
from seld_tpu.features import log_mel_spectrogram


def test_wav_roundtrip(tmp_path, rng):
    wave = (0.5 * rng.standard_normal((4, 24000))).astype(np.float32).clip(-1, 1)
    write_wav(tmp_path / "x.wav", wave, 24000)
    got, sr = load_wav(tmp_path / "x.wav")
    assert sr == 24000 and got.shape == wave.shape
    # 16-bit quantization + 32767/32768 scale asymmetry bound
    np.testing.assert_allclose(got, wave, atol=1e-4)


def test_discovery_pairs_and_missing_metadata(tmp_path):
    cfg = DataConfig(base_path=str(tmp_path))
    synthetic_raw_files(tmp_path, Config(), n_files=4, seconds=1.0, split_dirs=True)
    # make empty test dirs so discovery doesn't fail on glob
    for sub in ("dev-test-sony", "dev-test-tau"):
        (tmp_path / cfg.audio_dirname / sub).mkdir(parents=True, exist_ok=True)
        (tmp_path / cfg.metadata_dirname / sub).mkdir(parents=True, exist_ok=True)
    tr_a, tr_m, te_a, te_m = discover_files(cfg)
    assert len(tr_a) == len(tr_m) == 4
    assert te_a == [] and te_m == []
    assert all(Path(a).stem == Path(m).stem for a, m in zip(tr_a, tr_m))
    # removing one csv must hard-error (ref dataset.py:141-142)
    Path(tr_m[0]).unlink()
    with pytest.raises(FileNotFoundError):
        discover_files(cfg)


def test_single_file_mode_paths(tmp_path):
    cfg = DataConfig(base_path=str(tmp_path), use_full_dataset=False)
    tr_a, tr_m, te_a, te_m = discover_files(cfg)
    assert len(tr_a) == len(te_a) == 1
    assert "dev-train-sony" in tr_a[0] and "dev-test-sony" in te_a[0]


def test_compute_mel_matches_frontend_oracle(rng):
    import jax.numpy as jnp

    cfg = Config()
    wave = rng.standard_normal((4, 24000)).astype(np.float32)
    got = compute_mel_features(wave, cfg.features)  # (T, C, F)
    want = np.asarray(log_mel_spectrogram(jnp.asarray(wave)))  # (C, F, T)
    np.testing.assert_allclose(got, want.transpose(2, 0, 1), atol=1e-3)


def test_compute_mel_long_file_chunk_boundaries(rng):
    # 4ch x 70 s = 14,004 frames: crosses the 8192-frame device chunk;
    # values at and around the boundary must match the unchunked oracle.
    import jax.numpy as jnp

    cfg = Config()
    wave = rng.standard_normal((4, 70 * 24000)).astype(np.float32)
    got = compute_mel_features(wave, cfg.features)  # (T, C, F)
    want = np.asarray(log_mel_spectrogram(jnp.asarray(wave))).transpose(2, 0, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_spatial_features_long_file_chunk_boundaries(rng):
    # crosses the 2048-frame spatial chunk (50 s -> 2501 frames)
    import jax.numpy as jnp

    from seld_tpu.data.corpus import _frame_view
    from seld_tpu.features.spatial import extract_feature_frames

    cfg = Config().replace_path("features.feature_set", "mel_iv")
    wave = rng.standard_normal((4, 50 * 24000)).astype(np.float32)
    got = compute_mel_features(wave, cfg.features)  # (T, 7, F)
    frames = jnp.asarray(np.ascontiguousarray(_frame_view(wave, 960, 480)))
    want = np.asarray(extract_feature_frames(frames, "mel_iv", 960, 64, 24000))
    assert got.shape == want.shape == (2501, 7, 64)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_corpus_window_arithmetic():
    cfg = Config()
    corpus = synthetic_corpus(cfg, n_files=2, seconds=6.0, seed=0)
    win = cfg.window.window_frames(cfg.features)  # 250
    hop = cfg.window.hop_frames(cfg.features)  # 50
    # each 6 s file -> min(301 mel, 300 label) = 300 frames; 2 files = 600
    assert corpus.total_frames == 600
    # windows: starts 0,50,...,550 (start < total) -> 12 (ref dataset.py:274)
    assert len(corpus) == 12
    assert corpus.starts[-1] == 550
    # padded length covers the last window
    assert corpus.mel.shape[0] == 550 + win
    assert corpus.label_mask.shape == (550 + win, 648)
    mel_w, mask_w = corpus.gather(np.array([11]))
    assert mel_w.shape == (1, win, 4, 64)
    # padding region: zero mel, background labels (mask 0)
    assert (mel_w[0, -200:] == 0).all()
    assert (mask_w[0, -200:] == 0).all()


def test_batch_iterator_shapes_and_padding():
    cfg = Config()
    corpus = synthetic_corpus(cfg, n_files=1, seconds=6.0, seed=1)
    # 300 frames -> 6 windows; batch 4 -> batches of n_valid 4 and 2
    it = BatchIterator(corpus, batch_size=4, shuffle=True, seed=0, prefetch=2)
    assert len(it) == 2
    batches = list(it)
    assert [b.n_valid for b in batches] == [4, 2]
    for b in batches:
        assert b.mel.shape == (4, 250, 4, 64)
        assert b.label_mask.shape == (4, 250, 648)
    # shuffling differs across epochs but is deterministic per seed
    order1 = [b.mel.sum() for b in BatchIterator(corpus, 4, seed=3, prefetch=0)]
    it3 = BatchIterator(corpus, 4, seed=3, prefetch=0)
    order1b = [b.mel.sum() for b in it3]
    np.testing.assert_allclose(order1, order1b)


def test_batch_iterator_prefetch_modes_agree():
    cfg = Config()
    corpus = synthetic_corpus(cfg, n_files=1, seconds=6.0, seed=5)
    a = [(b.mel.sum(), b.label_mask.sum(), b.n_valid)
         for b in BatchIterator(corpus, 3, seed=1, prefetch=0)]
    b = [(x.mel.sum(), x.label_mask.sum(), x.n_valid)
         for x in BatchIterator(corpus, 3, seed=1, prefetch=3)]
    assert a == b


def test_gather_accdoa_requires_build_flag():
    cfg = Config()
    corpus = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    with pytest.raises(AssertionError):
        corpus.gather_accdoa(np.array([0]))


def test_gaussian_corpus_train_only():
    cfg = Config().replace_path("targets.use_gaussian_augmentation", True)
    train = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=2, train=True)
    test = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=2, train=False)
    # augmentation inflates active cells on train only
    # (ref smrl_seld_gaussian.py:2114-2127)
    assert (train.label_mask != 0).sum() > (test.label_mask != 0).sum()


def test_device_prefetch_order_and_lookahead():
    """device_prefetch yields placed items in order and keeps `depth`
    items placed ahead of consumption (the H2D/compute overlap half of
    the loader's double buffering)."""
    from seld_tpu.data.sampler import device_prefetch

    placed = []

    def place(x):
        placed.append(x)
        return x * 10

    gen = device_prefetch(range(5), place, depth=2)
    first = next(gen)
    assert first == 0
    assert placed == [0, 1, 2], "two items should be placed ahead at depth=2"
    assert list(gen) == [10, 20, 30, 40]
    assert placed == [0, 1, 2, 3, 4]

    # depth=1 still overlaps one batch
    placed.clear()
    gen = device_prefetch(range(3), place, depth=1)
    assert next(gen) == 0 and placed == [0, 1]
    assert list(gen) == [10, 20]

    # depth<=0 degenerates to inline placement, order preserved
    placed.clear()
    gen = device_prefetch(range(3), place, depth=0)
    assert next(gen) == 0 and placed == [0]
    assert list(gen) == [10, 20]
    # empty iterable
    assert list(device_prefetch([], place)) == []


def test_foa_gains_iv_recovers_labeled_doa():
    """The synthetic generator's SN3D panning must be decodable by the
    mel_iv intensity vectors: a panned tone's IV points at the labeled
    (az, el). Guards the FOA convention agreement between
    data/synthetic.py, features/spatial.py, and features/acs.py."""
    import jax.numpy as jnp

    from seld_tpu.data.synthetic import foa_gains
    from seld_tpu.features import frame_signal
    from seld_tpu.features.spatial import foa_intensity_mel, stft_frames

    sr, n_fft, hop, n_mels = 24000, 960, 480, 64
    t = np.arange(sr) / sr
    for az, el in [(0, 0), (90, 0), (-90, 30), (150, -45), (-135, 60)]:
        s = np.sin(2 * np.pi * 800 * t).astype(np.float32)
        wave = foa_gains(az, el)[:, None] * s[None]
        spec = stft_frames(frame_signal(jnp.asarray(wave), n_fft, hop), n_fft)
        iv = np.asarray(foa_intensity_mel(spec, n_mels, sr))  # (T, 3, M)
        ivm = iv.mean(axis=0)  # (3, M)
        band = np.argmax(np.abs(ivm).sum(axis=0))
        x, y, z = ivm[:, band]
        est_az = np.degrees(np.arctan2(y, x))
        est_el = np.degrees(np.arctan2(z, np.hypot(x, y)))
        assert abs(((est_az - az) + 180) % 360 - 180) < 1.0, (az, est_az)
        assert abs(est_el - el) < 1.0, (el, est_el)


def test_synthetic_doa_step_closure_and_no_clipping():
    """doa_step_deg directions must be closed under the 16 ACS
    transforms (the elevation flip in particular — regression: arange
    (-60, 61, 45) was not), and panned clips must never clip the int16
    write (overlap rescale is uniform, preserving channel ratios)."""
    from seld_tpu.data.synthetic import synthetic_clip
    from seld_tpu.features.acs import N_TRANSFORMS, transform_angles

    rng = np.random.default_rng(0)
    azs, els = set(), set()
    for _ in range(30):
        wave, rows = synthetic_clip(rng, 4.0, 24000, doa_step_deg=45)
        assert float(np.max(np.abs(wave))) <= 0.99 + 1e-6
        if len(rows):
            azs.update(rows[:, 3].tolist())
            els.update(rows[:, 4].tolist())
    assert azs and els
    assert all(a % 45 == 0 for a in azs)
    assert all(e % 45 == 0 and -45 <= e <= 45 for e in els)
    for t in range(N_TRANSFORMS):
        for a in azs:
            for e in els:
                ta, te = transform_angles(a, e, t)
                assert float(ta) % 45 == 0 and -180 <= float(ta) < 180
                assert float(te) in {-45.0, 0.0, 45.0}


def test_foa_gains_vectorized_matches_scalar():
    from seld_tpu.data.synthetic import foa_gains

    az = np.array([0.0, 90.0, -135.0, 179.5])
    el = np.array([0.0, 30.0, -60.0, 85.0])
    vec = foa_gains(az, el)  # (4, 4)
    assert vec.shape == (4, 4)
    for i in range(4):
        np.testing.assert_allclose(vec[:, i], foa_gains(az[i], el[i]),
                                   rtol=1e-6)


def test_moving_source_labels_follow_trajectory():
    """motion_deg_per_s: per-frame labels move at the configured angular
    speed (within rounding + the +-20% per-event jitter), azimuth wraps
    at the dateline, elevation stays inside the cap."""
    from seld_tpu.data.synthetic import synthetic_clip

    rng = np.random.default_rng(3)
    speeds = []
    for _ in range(40):
        wave, rows = synthetic_clip(rng, 4.0, 24000, event_rate_hz=0.25,
                                    motion_deg_per_s=90.0)
        if len(rows) < 3:
            continue
        az, el = rows[:, 3].astype(float), rows[:, 4].astype(float)
        assert np.all((az >= -180) & (az <= 180))
        assert np.all(np.abs(el) <= 85)
        d_az = (np.diff(az) + 180) % 360 - 180  # wrapped per-frame step
        d_el = np.diff(el)
        step = np.hypot(d_az, d_el)  # degrees per 100 ms
        # interior steps: 10 * step = deg/s; event speed is 90 +- 20%
        # (frame-midpoint clipping makes first/last steps smaller)
        interior = step[1:-1]
        if len(interior):
            speeds.extend((10.0 * interior).tolist())
    assert speeds, "no multi-frame moving events generated"
    speeds = np.asarray(speeds)
    # an elevation-cap bounce inside a frame shortens that step, so
    # bound the bulk of the distribution, not every sample
    assert np.quantile(speeds, 0.1) > 90 * 0.8 - 15, speeds.min()
    assert np.all(speeds < 90 * 1.2 + 15), speeds.max()
    assert abs(np.median(speeds) - 90) < 25, np.median(speeds)


def test_moving_source_iv_tracks_labels():
    """The per-sample pan must agree with the per-frame labels: mel_iv
    intensity vectors averaged over each metadata frame point at that
    frame's labeled (az, el). This is the learnability contract for the
    moving-source accuracy study (the static version:
    test_foa_gains_iv_recovers_labeled_doa)."""
    import jax.numpy as jnp

    from seld_tpu.data.synthetic import synthetic_clip
    from seld_tpu.features import frame_signal
    from seld_tpu.features.spatial import foa_intensity_mel, stft_frames

    sr, n_fft, hop, n_mels = 24000, 960, 480, 64
    rng = np.random.default_rng(11)
    checked = 0
    errors = []
    for _ in range(20):
        wave, rows = synthetic_clip(rng, 3.0, sr, event_rate_hz=1 / 3.0,
                                    motion_deg_per_s=60.0)
        if len(rows) < 4:
            continue
        spec = stft_frames(frame_signal(jnp.asarray(wave), n_fft, hop), n_fft)
        iv = np.asarray(foa_intensity_mel(spec, n_mels, sr))  # (T, 3, M)
        frames_per_meta = int(0.1 * sr / hop)  # 5 stft frames per 100 ms
        for mf, cls, src, az, el in rows[1:-1]:  # skip edge frames
            t0 = int(mf) * frames_per_meta
            seg = iv[t0: t0 + frames_per_meta]
            if seg.shape[0] < frames_per_meta:
                continue
            ivm = seg.mean(axis=0)  # (3, M)
            band = np.argmax(np.abs(ivm).sum(axis=0))
            x, y, z = ivm[:, band]
            est_az = np.degrees(np.arctan2(y, x))
            est_el = np.degrees(np.arctan2(z, np.hypot(x, y)))
            # 60 deg/s * 0.1 s frame = 6 deg of in-frame motion; allow
            # that plus STFT window spill into the next meta frame and
            # mel leakage per frame, but require tight median tracking
            err_az = abs(((est_az - az) + 180) % 360 - 180)
            err_el = abs(est_el - el)
            assert err_az < 14.0, (mf, az, est_az)
            assert err_el < 14.0, (mf, el, est_el)
            errors.append(max(err_az, err_el))
            checked += 1
    assert checked >= 10, checked
    assert np.median(errors) < 5.0, np.median(errors)
