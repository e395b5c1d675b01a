"""ACCDOA activity-threshold calibration (predict/eval/export
--accdoa-threshold, eval --accdoa-threshold-sweep): the ACCDOA
counterpart of the grid models' bg_bias decode operating point.
No reference counterpart (the reference has no ACCDOA family at all);
the 0.5 default is the DCASE2022-baseline convention
(seld_tpu/accdoa.py)."""

import numpy as np
import pytest

from seld_tpu.accdoa import decode_accdoa_to_grid, decode_accdoa_to_grid_jnp
from seld_tpu.config import Config
from seld_tpu.data import synthetic_corpus
from seld_tpu.eval import evaluate_model
from seld_tpu.infer import SELDPredictor, validate_accdoa_threshold

ACCDOA_OVERRIDES = [
    "model.model_type=accdoa_conformer",
    "model.conf_d_model=32",
    "model.conf_n_layers=1",
    "targets.accdoa=true",
]
MULTI_OVERRIDES = [
    "model.model_type=multi_accdoa_conformer",
    "model.conf_d_model=32",
    "model.conf_n_layers=1",
    "targets.accdoa=true",
    "targets.accdoa_tracks=3",
    "features.feature_set=mel_iv",  # TTA needs spatial features
]


@pytest.fixture(scope="module")
def accdoa_ckpt(tmp_path_factory):
    from conftest import train_tiny_checkpoint

    base = tmp_path_factory.mktemp("thr_accdoa")
    cfg, ckpt = train_tiny_checkpoint(base, extra_overrides=ACCDOA_OVERRIDES)
    return cfg, ckpt


@pytest.fixture(scope="module")
def multi_ckpt(tmp_path_factory):
    from conftest import train_tiny_checkpoint

    base = tmp_path_factory.mktemp("thr_multi")
    cfg, ckpt = train_tiny_checkpoint(base, extra_overrides=MULTI_OVERRIDES)
    return cfg, ckpt


def test_validation_semantics():
    assert validate_accdoa_threshold(None, True) == 0.5
    assert validate_accdoa_threshold(None, False) == 0.5  # default is inert
    assert validate_accdoa_threshold(0.3, True) == 0.3
    with pytest.raises(ValueError, match="grid models"):
        validate_accdoa_threshold(0.3, False)
    with pytest.raises(ValueError, match=">= 0"):
        validate_accdoa_threshold(-0.1, True)


def test_threshold_monotone_and_default():
    """Lower thresholds can only ADD active cells (vector norms are
    fixed; the gate is norm > T), and the jnp/numpy decoders agree at
    every threshold."""
    rng = np.random.default_rng(0)
    v = (rng.standard_normal((2, 6, 13, 3)) * 0.5).astype(np.float32)
    prev_active = None
    for th in (0.9, 0.5, 0.2, 0.0):
        g_np = decode_accdoa_to_grid(v, 6, 12, 14, th)
        g_j = np.asarray(decode_accdoa_to_grid_jnp(v, 6, 12, 14, th))
        # same active set and same class labels where both paint one
        # class (the two decoders use different multi-class-per-cell
        # tie-breaks, both documented as valid argmax-style grids)
        np.testing.assert_array_equal(g_np != 13, g_j != 13)
        active = g_j != 13
        if prev_active is not None:
            assert (active | ~prev_active).all()  # superset as th drops
            assert active.sum() >= prev_active.sum()
        prev_active = active
    assert prev_active.any()  # th=0 activates every nonzero vector


def test_predictor_threshold_paths(accdoa_ckpt):
    """The threshold reaches every predictor decode surface: plain,
    overlap (host-side _decode_avg), and streaming — and an explicit 0.5
    reproduces the default bitwise."""
    from seld_tpu.stream import stream_predict

    _, ckpt = accdoa_ckpt
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal((4, 36_000)) * 0.3).astype(np.float32)

    p_def = SELDPredictor(ckpt, batch_windows=2)
    p_same = SELDPredictor(ckpt, batch_windows=2, accdoa_threshold=0.5)
    np.testing.assert_array_equal(
        p_def.predict_waveform(wave).classes,
        p_same.predict_waveform(wave).classes,
    )

    p_lo = SELDPredictor(ckpt, batch_windows=2, accdoa_threshold=0.05)
    bg = p_lo.predict_waveform(wave).background_class
    lo = p_lo.predict_waveform(wave).classes
    hi = p_def.predict_waveform(wave).classes
    # a lower threshold can only add activity
    assert ((lo != bg) | (hi == bg)).all()
    assert (lo != bg).sum() >= (hi != bg).sum()

    # overlap decode (vectors averaged on host, thresholded in
    # _decode_avg) and streaming keep the bit-equality contract
    off = p_lo.predict_waveform(wave, overlap=0.5)
    st = stream_predict(p_lo, [wave[:, :10_000], wave[:, 10_000:]],
                        overlap=0.5)
    np.testing.assert_array_equal(st.classes, off.classes)


def test_predictor_rejects_threshold_on_grid_model(tiny_crnn_ckpt):
    with pytest.raises(ValueError, match="grid models"):
        SELDPredictor(tiny_crnn_ckpt, batch_windows=1, accdoa_threshold=0.4)


def test_eval_sweep_consistency(accdoa_ckpt):
    """Sweep rows equal dedicated evals at that threshold; best row is
    the SELD_error argmin; the main decode's threshold is recorded."""
    cfg, ckpt = accdoa_ckpt
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1,
                              train=False)
    ths = [0.1, 0.5, 0.9]
    m_sweep = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                             accdoa_threshold_sweep=ths)
    assert m_sweep["accdoa_threshold"] == 0.5
    rows = m_sweep["accdoa_threshold_sweep"]["metrics"]
    assert set(rows) == {repr(float(t)) for t in ths}
    for t in ths:
        m_t = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                             accdoa_threshold=t)
        assert m_t["accdoa_threshold"] == t
        for k in ("ER", "F_macro", "LE_macro", "LR_macro", "SELD_error"):
            assert rows[repr(float(t))][k] == pytest.approx(
                m_t["dcase2022"][k]
            )
    best = m_sweep["accdoa_threshold_sweep"]["best"]
    assert best["SELD_error"] == min(
        rows[repr(float(t))]["SELD_error"] for t in ths
    )


def test_eval_sweep_rejected_for_grid(tiny_crnn_ckpt):
    from seld_tpu.train.checkpoint import load_checkpoint_config

    cfg = load_checkpoint_config(tiny_crnn_ckpt)
    with pytest.raises(ValueError, match="grid models"):
        evaluate_model(cfg, None, tiny_crnn_ckpt,
                       save_visualizations=False,
                       accdoa_threshold_sweep=[0.4])


def test_tta_threshold_sweep_multi_accdoa(multi_ckpt):
    """Under identity-only TTA the per-view threshold sweep must
    reproduce the PLAIN per-threshold decodes exactly (identity TTA is
    bitwise the plain decode for multi-ACCDOA votes) — pinning that the
    sweep threads the threshold into each view's activity gate."""
    cfg, ckpt = multi_ckpt
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1,
                              train=False)
    ths = [0.2, 0.5, 0.8]
    m_tta = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                           tta_transforms=(0,),
                           accdoa_threshold_sweep=ths)
    rows = m_tta["accdoa_threshold_sweep"]["metrics"]
    for t in ths:
        m_plain = evaluate_model(cfg, test_c, ckpt,
                                 save_visualizations=False,
                                 accdoa_threshold=t)
        for k in ("ER", "F_macro", "LE_macro", "LR_macro", "SELD_error"):
            assert rows[repr(float(t))][k] == pytest.approx(
                m_plain["dcase2022"][k]
            ), (t, k)


def test_threshold_bakes_into_export(accdoa_ckpt, tmp_path):
    """export --accdoa-threshold: the artifact reproduces the live
    thresholded predictor bit-for-bit and the sidecar records it; the
    from_artifact predictor decodes overlap at the baked threshold."""
    import json

    import jax.numpy as jnp

    from seld_tpu.export import export_serving, load_serving

    _, ckpt = accdoa_ckpt
    out = export_serving(ckpt, tmp_path / "t.stablehlo", batch_windows=2,
                         accdoa_threshold=0.2)
    sidecar = json.loads((tmp_path / "t.stablehlo.json").read_text())
    assert sidecar["accdoa_threshold"] == 0.2

    p = SELDPredictor(ckpt, batch_windows=2, accdoa_threshold=0.2)
    fn, meta = load_serving(out)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal(meta["input_shape"]).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(fn(jnp.asarray(mel))),
        np.asarray(p._forward(p.state, jnp.asarray(mel))),
    )
    art = SELDPredictor.from_artifact(out)
    assert art.accdoa_threshold == 0.2


def test_cli_flags(accdoa_ckpt, tmp_path):
    """CLI wiring: eval sweep flag produces the report; predict
    --accdoa-threshold runs; --artifact composition is rejected."""
    from seld_tpu.cli import main
    from seld_tpu.data.synthetic import synthetic_raw_files

    cfg, ckpt = accdoa_ckpt
    over = [f"data.base_path={ckpt.parent}"] + ACCDOA_OVERRIDES
    rc = main(["eval", "--synthetic", *over,
               "--accdoa-threshold-sweep", "0.3,0.5"])
    assert rc == 0
    wav = synthetic_raw_files(tmp_path / "wavs", Config(), n_files=1,
                              seconds=2.0, seed=9)[0][0]
    rc = main(["predict", *over, "--wavs", str(wav),
               "--accdoa-threshold", "0.3",
               "--out", str(tmp_path / "pred")])
    assert rc == 0
    rc = main(["export", *over, "--out", str(tmp_path / "m.stablehlo"),
               "--batch-windows", "2", "--accdoa-threshold", "0.3"])
    assert rc == 0
    rc = main(["predict", *over, "--wavs", str(wav),
               "--artifact", str(tmp_path / "m.stablehlo"),
               "--accdoa-threshold", "0.4"])
    assert rc == 1  # named error: baked at export time
