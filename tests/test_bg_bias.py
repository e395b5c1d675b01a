"""Background-logit decode bias (SELDPredictor.bg_bias / eval --bg-bias):
a validation-tunable detection operating point for grid models. The
probe that motivated it (benchmarks/results/bg_bias_probe.json) measured
SELD_error 0.242 -> 0.199 on held-out scenes at the val-tuned bias. No
reference counterpart (the reference decodes plain argmax,
ref trainer.py:541-556)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import train_tiny_checkpoint
from seld_tpu.data import synthetic_corpus
from seld_tpu.data.audio import load_wav
from seld_tpu.data.synthetic import synthetic_raw_files
from seld_tpu.infer import SELDPredictor
from seld_tpu.train.checkpoint import load_checkpoint_config


def _wave(ckpt, name="bgb"):
    cfg = load_checkpoint_config(ckpt)
    wavs, _ = synthetic_raw_files(ckpt.parent / name, cfg, n_files=1,
                                  seconds=3.0)
    return load_wav(wavs[0])[0]


def test_bias_zero_is_plain_and_positive_bias_is_monotone(tiny_crnn_ckpt):
    wave = _wave(tiny_crnn_ckpt)
    plain = SELDPredictor(tiny_crnn_ckpt, batch_windows=2)
    b0 = SELDPredictor(tiny_crnn_ckpt, batch_windows=2, bg_bias=0.0)
    b2 = SELDPredictor(tiny_crnn_ckpt, batch_windows=2, bg_bias=2.0)

    ref = plain.predict_waveform(wave).classes
    z = b0.predict_waveform(wave).classes
    np.testing.assert_array_equal(z, ref)  # bias 0 is bitwise the plain path

    biased = b2.predict_waveform(wave).classes
    bg = plain.cfg.grid.num_classes - 1
    ev = ref != bg
    # positive bias only turns background cells into events — it can
    # never drop an event or change its class (event logits untouched)
    np.testing.assert_array_equal(biased[ev], ref[ev])
    assert (biased != bg).sum() >= ev.sum()


def test_bias_streaming_bit_equality(tiny_crnn_ckpt):
    from seld_tpu.stream import stream_predict

    wave = _wave(tiny_crnn_ckpt, "bgb_stream")
    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=2, bg_bias=1.5)
    off = p.predict_waveform(wave)
    chunks = [wave[:, i: i + 6000] for i in range(0, wave.shape[1], 6000)]
    st = stream_predict(p, chunks)
    np.testing.assert_array_equal(st.classes, off.classes)


def test_eval_bias_and_sweep_consistency(tiny_crnn_ckpt):
    """The sweep's per-bias metrics equal a dedicated eval at that bias,
    and the report names the SELD_error-best bias."""
    from seld_tpu.eval import evaluate_model

    cfg = load_checkpoint_config(tiny_crnn_ckpt)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1,
                              train=False)
    biases = [0.0, 0.7]
    m_sweep = evaluate_model(cfg, test_c, tiny_crnn_ckpt,
                             save_visualizations=False,
                             bg_bias_sweep=biases)
    assert m_sweep["bg_bias"] == 0.0
    sweep = m_sweep["bg_bias_sweep"]["metrics"]
    for b in biases:
        m_b = evaluate_model(cfg, test_c, tiny_crnn_ckpt,
                             save_visualizations=False, bg_bias=b)
        assert m_b["bg_bias"] == b
        for k in ("ER", "F_macro", "LE_macro", "LR_macro", "SELD_error"):
            assert sweep[repr(b)][k] == float(m_b["dcase2022"][k]), (b, k)
        # losses are bias-independent (decisions shift, not the loss)
        assert m_b["test_loss"] == m_sweep["test_loss"]
    best = m_sweep["bg_bias_sweep"]["best"]
    assert best["SELD_error"] == min(
        sweep[repr(b)]["SELD_error"] for b in biases
    )


def test_bias_rejected_for_accdoa(tmp_path):
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.eval import evaluate_model

    cfg = parse_overrides(Config(), [
        "model.model_type=accdoa_conformer",
        "targets.accdoa=true",
        f"data.base_path={tmp_path}",
    ])
    with pytest.raises(ValueError, match="grid models"):
        evaluate_model(cfg, None, tmp_path, bg_bias=1.0)

    # predictor-side rejection needs only the stored config check; use a
    # grid checkpoint dir with an accdoa cfg override is not possible, so
    # assert the ctor guard directly via the eval error above plus the
    # CLI artifact guard exercised in test_cli-level flows.


def test_bias_bakes_into_export(tiny_crnn_ckpt, tmp_path):
    """export --bg-bias: the artifact reproduces the live biased
    predictor bit-for-bit, and the sidecar records the bias."""
    import json

    import jax.numpy as jnp

    from seld_tpu.export import export_serving, load_serving

    wave = _wave(tiny_crnn_ckpt, "bgb_exp")
    live = SELDPredictor(tiny_crnn_ckpt, batch_windows=2, bg_bias=1.0)
    out = export_serving(tiny_crnn_ckpt, tmp_path / "b.stablehlo",
                         batch_windows=2, bg_bias=1.0)
    call, sidecar = load_serving(out)
    assert sidecar["bg_bias"] == 1.0

    ref = live.predict_waveform(wave)
    art = SELDPredictor.from_artifact(out)
    assert art.bg_bias == 1.0
    got = art.predict_waveform(wave)
    np.testing.assert_array_equal(got.classes, ref.classes)


def test_sweep_under_tta_matches_dedicated_tta_evals(tmp_path):
    """With tta_transforms set, the sweep calibrates the TTA decode:
    each sweep row equals a dedicated eval at that bias under the SAME
    transforms (the per-path calibration rule — a bias tuned on the
    plain decode does not transfer to the TTA average, which is how the
    round-3 swa_tta16_bias stage collapsed to background)."""
    from seld_tpu.eval import evaluate_model

    cfg, ckpt = train_tiny_checkpoint(
        tmp_path, extra_overrides=["features.feature_set=mel_iv"]
    )
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1,
                              train=False)
    biases = [0.0, 1.2]
    views = (0, 3, 8)
    m_sweep = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                             bg_bias_sweep=biases, tta_transforms=views)
    sweep = m_sweep["bg_bias_sweep"]["metrics"]
    for b in biases:
        m_b = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                             bg_bias=b, tta_transforms=views)
        for k in ("ER", "F_macro", "LE_macro", "LR_macro", "SELD_error"):
            assert sweep[repr(b)][k] == float(m_b["dcase2022"][k]), (b, k)


def test_bias_composes_with_tta_identity(tmp_path):
    """Bias applies inside each TTA view (pre-softmax): identity-only
    TTA at bias b reproduces the plain biased decisions exactly."""
    from seld_tpu.eval import evaluate_model

    cfg, ckpt = train_tiny_checkpoint(
        tmp_path, extra_overrides=["features.feature_set=mel_iv"]
    )
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1,
                              train=False)
    m_b = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                         bg_bias=0.8)
    m_bt = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                          bg_bias=0.8, tta_transforms=(0,))
    for k in ("overall_accuracy", "non_bg_accuracy"):
        assert m_b[k] == m_bt[k], k
    assert m_b["dcase2022"]["SELD_error"] == m_bt["dcase2022"]["SELD_error"]
