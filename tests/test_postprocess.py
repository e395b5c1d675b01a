"""Decoded-grid temporal majority smoothing (seld_tpu/postprocess.py;
predict/eval --median-filter). No reference counterpart (the reference
decodes plain argmax and stops, ref trainer.py:541-556) — this is the
standard SELD post-processing lever, measured on the capstone in
benchmarks/results/flagship_synth_accuracy.json's median stages."""

from __future__ import annotations

import numpy as np
import pytest

from seld_tpu.data import synthetic_corpus
from seld_tpu.data.audio import load_wav
from seld_tpu.data.synthetic import synthetic_raw_files
from seld_tpu.infer import SELDPredictor
from seld_tpu.postprocess import smooth_classes, validate_width


def oracle_smooth(classes, width, num_classes):
    """Literal restatement: per (frame, cell), majority class over the
    centered window (shrunk at edges), ties broken toward the original
    class; among non-original ties, the lowest class id wins (the
    vectorized code scans classes in ascending order with strict >)."""
    t, g = classes.shape
    half = width // 2
    out = classes.copy()
    for i in range(t):
        lo, hi = max(0, i - half), min(t, i + half + 1)
        for c in range(g):
            counts = np.bincount(classes[lo:hi, c], minlength=num_classes)
            best = counts.max()
            if counts[classes[i, c]] == best:
                continue  # original class ties the max -> keep it
            out[i, c] = int(np.argmax(counts))  # first max = lowest id
    return out


def test_validate_width():
    assert validate_width(0) == 0
    assert validate_width(1) == 1
    assert validate_width(7) == 7
    with pytest.raises(ValueError, match="odd"):
        validate_width(4)
    with pytest.raises(ValueError, match=">= 0"):
        validate_width(-3)


@pytest.mark.parametrize("width", [3, 5, 9])
def test_matches_literal_oracle(width):
    rng = np.random.default_rng(width)
    num_classes = 5
    classes = rng.integers(0, num_classes, (40, 7)).astype(np.int8)
    got = smooth_classes(classes, width, num_classes)
    np.testing.assert_array_equal(
        got, oracle_smooth(classes, width, num_classes)
    )
    assert got.dtype == classes.dtype


def test_identity_and_flicker():
    num_classes = 14
    # width 0/1: identity (same array content)
    classes = np.full((20, 3), 13, np.int8)
    np.testing.assert_array_equal(
        smooth_classes(classes, 0, num_classes), classes
    )
    np.testing.assert_array_equal(
        smooth_classes(classes, 1, num_classes), classes
    )
    # a single-frame flicker inside a held event is removed; the event
    # itself survives (idempotent on smooth regions)
    classes[5:15, 1] = 2
    classes[9, 1] = 7  # flicker
    sm = smooth_classes(classes, 3, num_classes)
    assert sm[9, 1] == 2
    assert (sm[6:14, 1] == 2).all()
    # batch leading dims work too
    batched = np.stack([classes, classes])
    np.testing.assert_array_equal(
        smooth_classes(batched, 3, num_classes)[0], sm
    )


def test_predictor_and_stream_bit_equality(tiny_crnn_ckpt):
    from seld_tpu.stream import stream_predict
    from seld_tpu.train.checkpoint import load_checkpoint_config

    cfg = load_checkpoint_config(tiny_crnn_ckpt)
    wavs, _ = synthetic_raw_files(tiny_crnn_ckpt.parent / "mfw", cfg,
                                  n_files=1, seconds=3.0)
    wave = load_wav(wavs[0])[0]

    plain = SELDPredictor(tiny_crnn_ckpt, batch_windows=2)
    filt = SELDPredictor(tiny_crnn_ckpt, batch_windows=2, median_filter=5)
    p_plain = plain.predict_waveform(wave)
    p_filt = filt.predict_waveform(wave)
    np.testing.assert_array_equal(
        p_filt.classes,
        smooth_classes(p_plain.classes, 5, cfg.grid.num_classes),
    )
    # streaming: fragments stay raw, the ASSEMBLED result is filtered ->
    # bitwise equal to offline (same assembled input)
    chunks = [wave[:, i: i + 6000] for i in range(0, wave.shape[1], 6000)]
    st = stream_predict(filt, chunks)
    np.testing.assert_array_equal(st.classes, p_filt.classes)

    with pytest.raises(ValueError, match="odd"):
        SELDPredictor(tiny_crnn_ckpt, batch_windows=2, median_filter=4)


def test_eval_filter_and_sweep_consistency(tiny_crnn_ckpt):
    """Sweep rows equal dedicated evals at that width; width 1 row equals
    the unfiltered metrics; losses are filter-independent."""
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train.checkpoint import load_checkpoint_config

    cfg = load_checkpoint_config(tiny_crnn_ckpt)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1,
                              train=False)
    widths = [1, 5]
    m_sweep = evaluate_model(cfg, test_c, tiny_crnn_ckpt,
                             save_visualizations=False,
                             median_filter_sweep=widths)
    assert m_sweep["median_filter"] == 0
    rows = m_sweep["median_filter_sweep"]["metrics"]
    for w in widths:
        m_w = evaluate_model(cfg, test_c, tiny_crnn_ckpt,
                             save_visualizations=False, median_filter=w)
        assert m_w["median_filter"] == w
        for k in ("ER", "F_macro", "LE_macro", "LR_macro", "SELD_error"):
            assert rows[str(w)][k] == float(m_w["dcase2022"][k]), (w, k)
        assert m_w["test_loss"] == m_sweep["test_loss"]
    for k in ("ER", "F_macro", "LE_macro", "LR_macro", "SELD_error"):
        assert rows["1"][k] == float(m_sweep["dcase2022"][k]), k
    best = m_sweep["median_filter_sweep"]["best"]
    assert best["SELD_error"] == min(
        rows[str(w)]["SELD_error"] for w in widths
    )


def test_export_sidecar_carries_median_filter(tiny_crnn_ckpt, tmp_path):
    """export --median-filter records the tuned width in the sidecar;
    from_artifact applies it automatically and reproduces the live
    filtered predictor bit-for-bit."""
    import json as _json

    from seld_tpu.export import export_serving
    from seld_tpu.train.checkpoint import load_checkpoint_config

    cfg = load_checkpoint_config(tiny_crnn_ckpt)
    wavs, _ = synthetic_raw_files(tmp_path / "wav", cfg, n_files=1,
                                  seconds=2.5)
    wave = load_wav(wavs[0])[0]
    out = export_serving(tiny_crnn_ckpt, tmp_path / "m.stablehlo",
                         batch_windows=2, median_filter=5)
    assert _json.loads((tmp_path / "m.stablehlo.json").read_text())[
        "median_filter"] == 5

    live = SELDPredictor(tiny_crnn_ckpt, batch_windows=2, median_filter=5)
    art = SELDPredictor.from_artifact(out)
    assert art.median_filter == 5
    np.testing.assert_array_equal(
        art.predict_waveform(wave).classes,
        live.predict_waveform(wave).classes,
    )

    with pytest.raises(ValueError, match="odd"):
        export_serving(tiny_crnn_ckpt, tmp_path / "bad.stablehlo",
                       batch_windows=2, median_filter=2)


def test_cli_predict_median_filter(tiny_crnn_ckpt, tmp_path, monkeypatch):
    from seld_tpu.cli import main
    from seld_tpu.train.checkpoint import load_checkpoint_config

    cfg = load_checkpoint_config(tiny_crnn_ckpt)
    wavs, _ = synthetic_raw_files(tmp_path / "wav", cfg, n_files=1,
                                  seconds=2.0)
    monkeypatch.chdir(tmp_path)
    ckpt_over = [
        f"data.base_path={tiny_crnn_ckpt.parent}",
        f"data.checkpoint_dirname={tiny_crnn_ckpt.name}",
        "--out", str(tmp_path / "out"),
    ]
    rc = main([
        "predict", *ckpt_over,
        "--median-filter", "5", "--wavs", str(wavs[0]),
    ])
    assert rc == 0
    assert (tmp_path / "out" / "predictions" / "clip000.csv").exists()
    rc = main([
        "predict", *ckpt_over,
        "--median-filter", "4", "--wavs", str(wavs[0]),
    ])
    assert rc == 1  # even width -> named error -> CLI exit 1