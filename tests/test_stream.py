"""Streaming inference (seld_tpu/stream.py): bit-equality with the offline
predictor under arbitrary chunking, bounded buffers, tail handling."""

from __future__ import annotations

import numpy as np
import pytest

from seld_tpu.infer import SELDPredictor
from seld_tpu.stream import StreamingSession, stream_predict


@pytest.fixture(scope="module")
def predictor(tiny_crnn_ckpt):
    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=1)
    p._test_base_path = tiny_crnn_ckpt.parent  # CLI resolves ckpts from here
    return p


def _clip(seconds, sr=24_000, seed=7):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((4, int(seconds * sr))) * 0.2).astype(np.float32)


@pytest.mark.parametrize("chunking", ["one_shot", "seconds", "ragged"])
def test_stream_matches_offline_predictor(predictor, chunking):
    wave = _clip(3.3)
    offline = predictor.predict_waveform(wave)

    n = wave.shape[1]
    if chunking == "one_shot":
        cuts = [n]
    elif chunking == "seconds":
        cuts = list(range(24_000, n, 24_000)) + [n]
    else:  # ragged, including tiny and prime-sized chunks
        rng = np.random.default_rng(0)
        cuts, pos = [], 0
        while pos < n:
            pos = min(pos + int(rng.integers(1, 40_000)), n)
            cuts.append(pos)
    chunks = [wave[:, a:b] for a, b in zip([0] + cuts[:-1], cuts)]

    streamed = stream_predict(predictor, chunks)
    assert streamed.classes.shape == offline.classes.shape
    np.testing.assert_array_equal(streamed.classes, offline.classes)


def test_stream_incremental_emission_and_bounded_buffer(predictor):
    wave = _clip(2.6)
    s = StreamingSession(predictor)
    frags = []
    max_buf = 0
    step = 12_000  # 0.5 s chunks
    for start in range(0, wave.shape[1], step):
        frags.extend(s.push(wave[:, start : start + step]))
        if s._buf is not None:
            max_buf = max(max_buf, s._buf.shape[1])
    frags.extend(s.flush())

    # fragments tile the clip in order
    assert frags[0][0] == 0
    ends = [f0 + cls.shape[0] for f0, cls in frags]
    starts = [f0 for f0, _ in frags]
    assert starts[1:] == ends[:-1]
    # raw buffer never holds much more than one analysis window of samples
    feat = predictor.cfg.features
    win_samples = predictor.win * feat.hop_length
    assert max_buf <= win_samples + step + 2 * feat.n_fft
    # a full window (50 frames at 1 s window) emits before the stream ends
    assert len(frags) >= 2 and frags[0][1].shape[0] == predictor.win


def test_stream_short_clip_and_empty(predictor):
    # shorter than one window -> single flush-time fragment
    wave = _clip(0.4)
    offline = predictor.predict_waveform(wave)
    streamed = stream_predict(predictor, [wave])
    np.testing.assert_array_equal(streamed.classes, offline.classes)

    s = StreamingSession(predictor)
    assert s.flush() == []  # empty stream


def test_cli_stream_predict_matches_offline_csv(predictor, tmp_path):
    from seld_tpu.cli import main
    from seld_tpu.data.audio import write_wav

    wav = tmp_path / "clip.wav"
    write_wav(wav, _clip(2.2), 24_000)
    base = [f"data.base_path={predictor._test_base_path}"]
    rc = main(["predict", *base, "--wavs", str(wav),
               "--out", str(tmp_path / "off")])
    assert rc == 0
    rc = main(["predict", *base, "--wavs", str(wav), "--stream",
               "--out", str(tmp_path / "str")])
    assert rc == 0
    off = (tmp_path / "off" / "predictions" / "clip.csv").read_text()
    stm = (tmp_path / "str" / "predictions" / "clip.csv").read_text()
    assert off == stm


def test_stream_rejects_push_after_flush(predictor):
    s = StreamingSession(predictor)
    s.push(_clip(0.2))
    s.flush()
    with pytest.raises(AssertionError):
        s.push(_clip(0.1))


def test_stream_exact_pad_sized_chunks(predictor):
    """20 ms (480-sample = n_fft//2) chunks — a natural live-stream size
    that used to trip the frame-0 reflection assert."""
    wave = _clip(1.7)
    offline = predictor.predict_waveform(wave)
    chunks = [wave[:, i : i + 480] for i in range(0, wave.shape[1], 480)]
    streamed = stream_predict(predictor, chunks)
    np.testing.assert_array_equal(streamed.classes, offline.classes)


def test_stream_tiny_clip_multifold_reflection(predictor):
    """Clips shorter than n_fft//2 need multi-fold reflect padding; the
    flush path must still match the offline framer bit-for-bit."""
    for n in (100, 479, 481, 700):
        wave = _clip(n / 24_000.0)[:, :n]
        offline = predictor.predict_waveform(wave)
        streamed = stream_predict(predictor, [wave])
        np.testing.assert_array_equal(
            streamed.classes, offline.classes, err_msg=f"n={n}"
        )


@pytest.fixture(scope="module")
def predictor_iv(tmp_path_factory):
    """Spatial feature set (mel+IV, 7 channels) — exercises the chunked
    spatial feature path under streaming."""
    from conftest import train_tiny_checkpoint

    tmp = tmp_path_factory.mktemp("stream_iv")
    _, ckpt = train_tiny_checkpoint(
        tmp, extra_overrides=["features.feature_set=mel_iv"]
    )
    return SELDPredictor(ckpt, batch_windows=1)


def test_stream_matches_offline_with_spatial_features(predictor_iv):
    wave = _clip(2.4)
    offline = predictor_iv.predict_waveform(wave)
    chunks = [wave[:, i : i + 17_000] for i in range(0, wave.shape[1], 17_000)]
    streamed = stream_predict(predictor_iv, chunks)
    np.testing.assert_array_equal(streamed.classes, offline.classes)


def test_cli_predict_overlap_flag(predictor, tmp_path):
    from seld_tpu.cli import main
    from seld_tpu.data.audio import write_wav

    wav = tmp_path / "ov.wav"
    write_wav(wav, _clip(1.8), 24_000)
    rc = main(["predict", f"data.base_path={predictor._test_base_path}",
               "--wavs", str(wav), "--overlap", "0.5",
               "--out", str(tmp_path / "ov")])
    assert rc == 0
    assert (tmp_path / "ov" / "predictions" / "ov.csv").exists()


@pytest.mark.parametrize("overlap", [0.5, 0.8])
def test_stream_overlap_matches_offline_overlap(predictor, overlap):
    """Overlapped probability averaging streams with the identical window
    schedule and accumulation order as predict_waveform(overlap=...) —
    bit-equal output."""
    wave = _clip(3.1)
    offline = predictor.predict_waveform(wave, overlap=overlap)
    chunks = [wave[:, i : i + 13_000] for i in range(0, wave.shape[1], 13_000)]
    streamed = stream_predict(predictor, chunks, overlap=overlap)
    assert streamed.classes.shape == offline.classes.shape
    np.testing.assert_array_equal(streamed.classes, offline.classes)


def test_stream_overlap_short_clip(predictor):
    wave = _clip(0.6)  # shorter than one window
    offline = predictor.predict_waveform(wave, overlap=0.5)
    streamed = stream_predict(predictor, [wave], overlap=0.5)
    np.testing.assert_array_equal(streamed.classes, offline.classes)


def test_stream_overlap_emits_incrementally(predictor):
    wave = _clip(3.0)
    s = StreamingSession(predictor, overlap=0.5)
    frag_counts = []
    for start in range(0, wave.shape[1], 24_000):
        frag_counts.append(len(s.push(wave[:, start : start + 24_000])))
    tail = s.flush()
    assert sum(frag_counts) >= 2  # emission happens before end-of-stream
    # fragments tile contiguously
    all_frags = []
    s2 = StreamingSession(predictor, overlap=0.5)
    for start in range(0, wave.shape[1], 24_000):
        all_frags.extend(s2.push(wave[:, start : start + 24_000]))
    all_frags.extend(s2.flush())
    ends = [f0 + c.shape[0] for f0, c in all_frags]
    assert [f0 for f0, _ in all_frags][1:] == ends[:-1]


def test_cli_stream_with_overlap_matches_offline_overlap(predictor, tmp_path):
    from seld_tpu.cli import main
    from seld_tpu.data.audio import write_wav

    wav = tmp_path / "x.wav"
    write_wav(wav, _clip(2.3), 24_000)
    base = [f"data.base_path={predictor._test_base_path}"]
    rc = main(["predict", *base, "--wavs", str(wav), "--overlap", "0.5",
               "--out", str(tmp_path / "a")])
    assert rc == 0
    rc = main(["predict", *base, "--wavs", str(wav), "--stream",
               "--overlap", "0.5", "--out", str(tmp_path / "b")])
    assert rc == 0
    assert (tmp_path / "a" / "predictions" / "x.csv").read_text() == \
        (tmp_path / "b" / "predictions" / "x.csv").read_text()


@pytest.mark.parametrize("model_over", [
    ["model.model_type=accdoa_conformer"],
    ["model.model_type=multi_accdoa_conformer", "targets.accdoa_tracks=3"],
])
def test_overlap_for_accdoa_models(tmp_path, model_over):
    """ACCDOA-family overlap: the averageable representation (vectors /
    class-activity votes) is accumulated over overlapping windows and
    decoded by the shared _decode_avg — streamed output stays bit-equal
    to offline, and the decode produces a valid class grid."""
    from conftest import train_tiny_checkpoint

    from seld_tpu.stream import stream_predict

    _, ckpt = train_tiny_checkpoint(tmp_path, extra_overrides=[
        *model_over,
        "model.conf_d_model=32",
        "model.conf_n_layers=1",
        "targets.accdoa=true",
    ])
    p = SELDPredictor(ckpt, batch_windows=2)
    wave = _clip(2.3)
    off = p.predict_waveform(wave, overlap=0.5)
    assert off.classes.dtype == np.int8
    assert off.classes.shape[1] == p.cfg.grid.n_cells
    assert off.classes.max() <= p.cfg.grid.num_classes - 1

    chunks = [wave[:, i: i + 6000] for i in range(0, wave.shape[1], 6000)]
    st = stream_predict(p, chunks, overlap=0.5)
    np.testing.assert_array_equal(st.classes, off.classes)


@pytest.mark.parametrize("n_fft,hop", [(961, 480), (511, 256), (960, 480)])
def test_streamed_mel_frames_bit_equal_odd_nfft(n_fft, hop):
    """Mel-frame production must match the offline framer bit-for-bit for
    ODD n_fft too (offline reflects exactly pad samples then zero-pads the
    last frame's final sample; streaming must not over-reflect)."""
    from types import SimpleNamespace

    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data.corpus import compute_mel_features

    cfg = parse_overrides(Config(), [
        f"features.n_fft={n_fft}", f"features.hop_length={hop}",
    ])
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal((2, hop * 37 + 5)) * 0.4).astype(np.float32)
    offline = compute_mel_features(wave, cfg.features)

    fake = SimpleNamespace(cfg=cfg, win=50, accdoa_mode=False)
    s = StreamingSession(fake)
    collected = []
    s._emit_ready = lambda final: collected.append(
        s._mel.copy() if s._mel is not None else None
    ) or (setattr(s, "_mel", None) or [])
    for start in range(0, wave.shape[1], 7001):
        s.push(wave[:, start : start + 7001])
    s.flush()
    got = np.concatenate([m for m in collected if m is not None], axis=0)
    assert got.shape == offline.shape
    np.testing.assert_array_equal(got, offline)


def test_streamed_mel_random_chunkings_bit_equal():
    """Hypothesis over arbitrary chunk splits (incl. empty and 1-sample
    chunks): streamed mel frames == offline frames, bit for bit."""
    from types import SimpleNamespace

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from seld_tpu.config import Config
    from seld_tpu.data.corpus import compute_mel_features

    cfg = Config()  # n_fft=960, hop=480 — one jit compile for all examples
    rng0 = np.random.default_rng(11)
    wave = (rng0.standard_normal((2, 30_000)) * 0.4).astype(np.float32)
    offline = compute_mel_features(wave, cfg.features)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(0, 9000), min_size=1, max_size=12))
    def check(chunk_sizes):
        fake = SimpleNamespace(cfg=cfg, win=50, accdoa_mode=False)
        s = StreamingSession(fake)
        collected = []
        s._emit_ready = lambda final: collected.append(
            s._mel.copy() if s._mel is not None else None
        ) or (setattr(s, "_mel", None) or [])
        pos = 0
        for c in chunk_sizes:
            if pos >= wave.shape[1]:
                break
            s.push(wave[:, pos : pos + c])
            pos += c
        if pos < wave.shape[1]:
            s.push(wave[:, pos:])
        s.flush()
        got = np.concatenate([m for m in collected if m is not None], axis=0)
        np.testing.assert_array_equal(got, offline)

    check()
