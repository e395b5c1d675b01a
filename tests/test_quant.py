"""Int8 PTQ serving path (seld_tpu/quant.py): exactness on grid-aligned
values, coverage/exclusion rules, calibration, and end-to-end closeness
on a trained checkpoint. The reference has no quantization story."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from seld_tpu.config import Config, parse_overrides
from seld_tpu.models import build_model, init_variables
from seld_tpu.quant import (
    build_quant_tree,
    calibrate_activation_scales,
    quantize_model,
    quantized_apply,
)


def test_int8_exact_on_grid_aligned_values():
    """With weights and inputs exactly representable on the int8 grid,
    the quantized conv+dense pipeline must reproduce the float output
    EXACTLY (symmetric quantization keeps zero and the grid exact)."""

    class C(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(8, (1, 3), padding=1, strides=(1, 2), name="c")(x)

    class D(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.DenseGeneral(features=(2, 3), name="d")(x)

    rng = np.random.default_rng(0)
    for m, shape, n_out in ((C(), (2, 1, 7, 4), 1), (D(), (2, 5), 2)):
        # single layers only: chaining would push intermediate values
        # outside the +-127 grid and clip
        x = rng.integers(-40, 41, shape).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))

        # integer weights with absmax exactly 127 in EVERY output
        # channel (s_w is per-channel), so s_w = 1 and w_q == w exactly
        def int_weights(a, n_out=n_out):
            w = rng.integers(-127, 128, a.shape).astype(np.float32)
            if w.ndim > 1:  # kernel: reduce dims lead, channels trail
                n_ch = int(np.prod(w.shape[-n_out:]))
                w.reshape(-1, n_ch)[0, :] = 127.0
            return jnp.asarray(w)

        v = jax.tree_util.tree_map(int_weights, v)
        qt = quantize_model(m, v, [x])
        # force s_x = 1 so integer inputs land exactly on the grid
        for q in qt.values():
            q["s_x"] = jnp.float32(1.0)
            np.testing.assert_array_equal(np.asarray(q["s_w"]), 1.0)
        ref = np.asarray(m.apply(v, jnp.asarray(x)))
        got = np.asarray(quantized_apply(m, v, qt, jnp.asarray(x)))
        np.testing.assert_array_equal(got, ref)


def test_eligibility_rules():
    """Depthwise convs (conformer conv module) and recurrent-gate
    denses (GRU under nn.scan) must NOT be quantized; trunk convs,
    denses, and the class-major DenseGeneral head must be."""
    for model_type, present, absent in (
        (
            "conformer",
            # the conv module's GLU pointwise DENSES do quantize; only
            # its depthwise Conv stays float
            ["GridHead_0/logits", "GridHead_0/Dense_0",
             "ConformerConvModule_0/Dense_0"],
            ["ConformerConvModule_0/Conv_0"],
        ),
        ("crnn", ["GridHead_0/logits"], ["BiGRU", "rnn", "cell"]),
    ):
        cfg = parse_overrides(
            Config(),
            [
                f"model.model_type={model_type}",
                "model.compute_dtype=float32",
                "model.crnn_cnn_channels=8,16",
                "model.conf_d_model=32",
                "model.conf_n_layers=1",
            ],
        )
        model = build_model(cfg.model, cfg.grid)
        x = np.random.default_rng(0).standard_normal(
            (2, 10, 4, 64)
        ).astype(np.float32)
        v = init_variables(model, jax.random.PRNGKey(0), jnp.asarray(x))
        qt = quantize_model(model, v, [x])
        paths = "\n".join(qt)
        for frag in present:
            assert frag in paths, (model_type, frag, paths)
        for frag in absent:
            assert frag not in paths, (model_type, frag)
        # depthwise conformer conv: its kernel exists in params but not qt
        if model_type == "conformer":
            flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
            assert any(
                "ConformerConvModule" in "/".join(
                    str(getattr(k, "key", k)) for k in kp
                )
                for kp, _ in flat
            )


def test_calibration_scale_tracks_input_range():
    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(4, name="d")(x)

    m = M()
    x1 = np.ones((2, 8), np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x1))
    s_small = calibrate_activation_scales(m, v, [x1])["d"]
    s_big = calibrate_activation_scales(m, v, [x1, 10.0 * x1])["d"]
    assert s_big == pytest.approx(10 * s_small, rel=1e-6)
    # scales feed the tree builder
    qt = build_quant_tree(m, v, {"d": s_big})
    assert qt["d"]["w_q"].dtype == jnp.int8
    with pytest.raises(ValueError):
        calibrate_activation_scales(m, v, [])


def test_quantized_flagship_close_and_jittable():
    """The full ResNet50-Conformer quantizes end-to-end; the jitted
    quantized forward stays close to f32 (scale-level check, not a
    trained-accuracy claim) and is deterministic."""
    cfg = parse_overrides(Config(), ["model.compute_dtype=float32"])
    model = build_model(cfg.model, cfg.grid)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 10, 4, 64)).astype(np.float32)
    v = init_variables(model, jax.random.PRNGKey(0), jnp.asarray(x))
    qt = quantize_model(model, v, [x])
    assert len(qt) > 60  # the whole trunk + head is covered
    f = jax.jit(lambda v, q, x: quantized_apply(model, v, q, x))
    got = np.asarray(f(v, qt, jnp.asarray(x)))
    ref = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.15, rel
    again = np.asarray(f(v, qt, jnp.asarray(x)))
    np.testing.assert_array_equal(got, again)


def test_quantized_predictor_end_to_end(tiny_crnn_ckpt):
    """SELDPredictor.quantize(): self-calibrated int8 serving produces
    near-identical predictions to the float path on a trained
    checkpoint, and streaming stays bit-equal to offline in int8 mode."""
    from seld_tpu.data.audio import load_wav
    from seld_tpu.data.synthetic import synthetic_raw_files
    from seld_tpu.infer import SELDPredictor
    from seld_tpu.stream import stream_predict
    from seld_tpu.train.checkpoint import load_checkpoint_config

    cfg = load_checkpoint_config(tiny_crnn_ckpt)
    p_f32 = SELDPredictor(tiny_crnn_ckpt, batch_windows=2)
    wavs, _ = synthetic_raw_files(
        tiny_crnn_ckpt.parent / "qwav", cfg, n_files=1, seconds=3.0
    )
    wave, _ = load_wav(wavs[0])

    p_int8 = SELDPredictor(tiny_crnn_ckpt, batch_windows=2)
    p_int8.quantize(calib_waves=[wave])
    ref = p_f32.predict_waveform(wave)
    got = p_int8.predict_waveform(wave)
    agree = float((ref.classes == got.classes).mean())
    assert agree > 0.97, agree

    # int8 streaming is bit-equal to int8 offline (same contract as f32)
    chunks = [wave[:, i : i + 6000] for i in range(0, wave.shape[1], 6000)]
    st = stream_predict(p_int8, chunks)
    assert np.array_equal(st.classes, got.classes)


def test_eval_int8(tiny_crnn_ckpt):
    """eval --int8: evaluate_model scores the int8-quantized forward
    (self-calibrated on the first eval batches) — the accuracy gate for
    int8 serving/export on labeled data. Near-float metrics on a trained
    tiny checkpoint; weight-only mode runs too; a mesh is rejected."""
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train.checkpoint import load_checkpoint_config

    cfg = load_checkpoint_config(tiny_crnn_ckpt)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1,
                              train=False)
    m_f = evaluate_model(cfg, test_c, tiny_crnn_ckpt,
                         save_visualizations=False)
    # visualizations ON: the int8 viz second pass (quantized forward on
    # the arbitrary-size selected-window batch) must run too
    m_q = evaluate_model(cfg, test_c, tiny_crnn_ckpt,
                         num_visualizations=1, int8=True)
    assert m_f["quantized_int8"] is False and m_q["quantized_int8"] is True
    assert m_q["visualizations"], "int8 viz pass produced no artifact"
    assert np.isfinite(m_q["test_loss"])
    assert abs(m_q["overall_accuracy"] - m_f["overall_accuracy"]) < 2.0

    m_w = evaluate_model(cfg, test_c, tiny_crnn_ckpt,
                         save_visualizations=False, int8=True,
                         int8_weight_only=True)
    # weight-only compute is original-precision: even closer to float
    assert abs(m_w["overall_accuracy"] - m_f["overall_accuracy"]) < 1.0

    with pytest.raises(ValueError, match="mesh"):
        evaluate_model(cfg, test_c, tiny_crnn_ckpt, int8=True, mesh=object())


def test_eval_int8_multi_accdoa(tmp_path):
    """eval --int8 on a multi-ACCDOA checkpoint: the quantized forward
    feeds the vector decode (the distilled-student serving config,
    benchmarks/multi_accdoa_distill.py) — near-float metrics on a tiny
    trained model."""
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import train_model

    cfg = parse_overrides(Config(), [
        "model.model_type=multi_accdoa_conformer",
        "model.crnn_cnn_channels=8,16",
        "model.conf_d_model=32",
        "model.conf_n_heads=4",
        "model.conf_n_layers=1",
        "model.compute_dtype=float32",
        "targets.accdoa=true",
        "targets.accdoa_tracks=3",
        "window.window_seconds=1.0",
        "window.hop_seconds=0.5",
        "train.batch_size=2",
        "train.num_epochs=1",
        "train.save_every_n_epochs=1",
        f"data.base_path={tmp_path}",
    ])
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")

    m_f = evaluate_model(cfg, test_c, tmp_path / "ckpt",
                         save_visualizations=False)
    m_q = evaluate_model(cfg, test_c, tmp_path / "ckpt",
                         save_visualizations=False, int8=True)
    assert m_q["quantized_int8"] is True
    assert np.isfinite(m_q["test_loss"])
    assert abs(m_q["overall_accuracy"] - m_f["overall_accuracy"]) < 2.0


def test_eval_int8_composes_with_tta(tiny_crnn_ckpt):
    """int8 + identity-only TTA: the TTA forward must wrap the QUANTIZED
    apply, so averaging over just the identity transform reproduces the
    plain int8 eval's decisions exactly (softmax is monotone per cell).
    Needs mel_iv for TTA -> retrain a tiny mel_iv checkpoint."""
    from conftest import train_tiny_checkpoint

    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model

    base = tiny_crnn_ckpt.parent / "iv_eval_tta"
    base.mkdir(exist_ok=True)
    cfg, ckpt = train_tiny_checkpoint(
        base, extra_overrides=["features.feature_set=mel_iv"]
    )
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1,
                              train=False)
    m_q = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                         int8=True)
    m_qt = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                          int8=True, tta_transforms=(0,))
    for k in ("overall_accuracy", "non_bg_accuracy", "test_loss"):
        assert m_qt[k] == m_q[k], (k, m_qt[k], m_q[k])
    assert m_qt["dcase2022"]["SELD_error"] == m_q["dcase2022"]["SELD_error"]


def test_weight_only_mode(tiny_crnn_ckpt):
    """weight_only=True: int8 weight storage with original-precision
    compute — closer to float than full w8a8 (no activation clipping),
    and the quant tree carries no activation scales."""
    from seld_tpu.infer import SELDPredictor

    rng = np.random.default_rng(3)
    calib = [rng.standard_normal((4, 24000)).astype(np.float32) * 0.1]
    mel = None

    p_f = SELDPredictor(tiny_crnn_ckpt, batch_windows=1)
    p_w8 = SELDPredictor(tiny_crnn_ckpt, batch_windows=1)
    p_w8.quantize(calib_waves=calib, weight_only=True)
    assert all("s_x" not in q for q in p_w8._quant_tree.values())
    p_w8a8 = SELDPredictor(tiny_crnn_ckpt, batch_windows=1)
    p_w8a8.quantize(calib_waves=calib)

    mel = jnp.asarray(
        rng.standard_normal(
            (1, p_f.win, 4, p_f.cfg.model.n_mels)
        ).astype(np.float32)
    )
    a = np.asarray(p_f._forward(p_f.state, mel))
    b = np.asarray(p_w8._forward(p_w8.state, mel))
    agree_w8 = float((a == b).mean())
    assert agree_w8 > 0.99, agree_w8


def test_weight_only_export_is_smaller(tiny_crnn_ckpt, tmp_path):
    """The weight-only artifact stores int8 kernels: measurably smaller
    than the float export of the same checkpoint."""
    from seld_tpu.export import export_serving

    rng = np.random.default_rng(0)
    calib = [rng.standard_normal((4, 24000)).astype(np.float32) * 0.1]
    full = export_serving(tiny_crnn_ckpt, tmp_path / "f.stablehlo",
                          batch_windows=1)
    w8 = export_serving(
        tiny_crnn_ckpt, tmp_path / "w8.stablehlo", batch_windows=1,
        int8_calib_waves=calib, int8_weight_only=True,
    )
    import json as _json

    sidecar = _json.loads((tmp_path / "w8.stablehlo.json").read_text())
    assert sidecar["int8_weight_only"] is True
    # the GRU/norm leaves stay float, so expect >2x not a strict 4x
    assert w8.stat().st_size < full.stat().st_size / 1.5, (
        w8.stat().st_size, full.stat().st_size
    )


def test_qat_fake_quant_matches_ptq_numerics():
    """The QAT forward at a given batch equals the w8a8 PTQ forward
    calibrated on that same batch (same scales by construction: both use
    the batch absmax) within float tolerance — training sees exactly
    what int8 serving will compute."""
    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(8, (1, 3), padding=1, name="c")(x)

    from seld_tpu.quant import qat_apply

    m = M()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 9, 4)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    qt = quantize_model(m, v, [x])
    ptq = np.asarray(quantized_apply(m, v, qt, jnp.asarray(x)))
    qat = np.asarray(qat_apply(m, v, jnp.asarray(x)))
    np.testing.assert_allclose(qat, ptq, rtol=1e-5, atol=1e-5)


def test_qat_gradients_flow_and_train_step_runs():
    """Straight-through estimators: the QAT train step produces nonzero
    gradients for quantized layers and repeated steps reduce the loss."""
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.train import create_train_state, make_optimizer
    from seld_tpu.train.steps import make_train_step

    cfg = parse_overrides(
        Config(),
        ["model.model_type=crnn", "model.crnn_cnn_channels=8,16",
         "model.crnn_rnn_hidden=16", "model.crnn_rnn_layers=1",
         "model.compute_dtype=float32"],
    )
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 10, 4, 64)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2**13, (2, 10, 648)).astype(np.uint16))
    em = jnp.ones((2,), jnp.float32)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    step = make_train_step(model, loss_fn, opt, 14, donate=False, qat=True)

    losses = []
    key = jax.random.PRNGKey(1)
    p_before = jax.tree_util.tree_leaves(state.params)
    for _ in range(4):
        state, metrics = step(state, mel, mask, em, key)
        losses.append(float(metrics["loss"]))
    p_after = jax.tree_util.tree_leaves(state.params)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(p_before, p_after)
    )
    assert moved, "QAT gradients did not update parameters"
    assert losses[-1] < losses[0], losses


def test_fake_quant_properties():
    """_fake_quant: grid snap within half a scale step inside the range,
    clamp outside, exact zeros, and idempotence on the grid."""
    from seld_tpu.quant import _fake_quant

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((512,)) * 3, jnp.float32)
    s = jnp.float32(0.05)
    q = np.asarray(_fake_quant(x, s))
    in_range = np.abs(np.asarray(x)) <= 127 * 0.05
    # snap error bounded by s/2 inside the representable range
    assert np.all(np.abs(q[in_range] - np.asarray(x)[in_range]) <= 0.025 + 1e-7)
    # clamp at the edges
    assert np.all(np.abs(q) <= 127 * 0.05 + 1e-6)
    # zero is exact (symmetric quantization)
    assert float(_fake_quant(jnp.zeros(()), s)) == 0.0
    # idempotent on grid values
    q2 = np.asarray(_fake_quant(jnp.asarray(q), s))
    np.testing.assert_allclose(q2, q, atol=1e-7)

    # straight-through: gradient of sum(fake_quant(x)) is all-ones
    g = jax.grad(lambda v: _fake_quant(v, s).sum())(x)
    np.testing.assert_array_equal(np.asarray(g), 1.0)
