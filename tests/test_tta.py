"""ACS test-time augmentation (seld_tpu/tta.py + SELDPredictor.tta).

Contracts:
  * the inverse tables are exact permutation inverses (pure numpy);
  * TTA over just the identity transform reproduces the plain forward;
  * group-averaging property: TTA prediction of a transformed scene ==
    label-transform of the TTA prediction of the original scene (the
    classic result that group averaging makes ANY predictor equivariant
    — summands are bit-identical, only the sum order differs);
  * single-ACCDOA vectors back-rotate exactly; plain "mel" features are
    rejected with a named error;
  * multi-ACCDOA averages in DECODED space (per-class cell-activity
    votes): identity TTA reproduces the plain decode bit-for-bit and
    the full-group vote map is BITWISE equivariant;
  * streaming keeps its offline bit-equality under TTA.
"""

import numpy as np
import pytest

from seld_tpu.config import Config, parse_overrides
from seld_tpu.data import synthetic_corpus
from seld_tpu.data.synthetic import synthetic_raw_files
from seld_tpu.features.acs import (
    N_TRANSFORMS,
    acs_tables,
    audio_channel_transform,
    vector_tables,
)
from seld_tpu.infer import SELDPredictor
from seld_tpu.tta import make_tta_forward, validate_transforms
from seld_tpu.train import train_model
from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def grid_ckpt(tmp_path_factory):
    """Tiny mel_iv grid-model checkpoint + a short mel_iv waveform."""
    tmp = tmp_path_factory.mktemp("tta_grid")
    cfg = tiny_config(tmp, **{
        "features.feature_set": "mel_iv", "train.num_epochs": 1,
    })
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp / "ckpt")
    wavs, _ = synthetic_raw_files(tmp / "wav", cfg, n_files=1, seconds=2.2)
    from seld_tpu.data.audio import load_wav

    wave, _ = load_wav(wavs[0])
    return tmp / "ckpt", cfg, wave, wavs[0]


def test_validate_transforms():
    assert validate_transforms(None) == tuple(range(N_TRANSFORMS))
    assert validate_transforms([3, 0]) == (3, 0)
    with pytest.raises(ValueError, match="at least one"):
        validate_transforms(())
    with pytest.raises(ValueError, match="duplicate"):
        validate_transforms((1, 1))
    with pytest.raises(ValueError, match=r"\[0, 16\)"):
        validate_transforms((16,))


def test_inverse_tables_are_exact():
    cg, _, _ = acs_tables(18, 36, "mel_iv")
    vp, vs = vector_tables("mel_iv")
    rng = np.random.default_rng(0)
    vec = rng.standard_normal((5, 3))
    for t in range(N_TRANSFORMS):
        inv = np.argsort(cg[t])
        # new[c] = old[cg[c]]  =>  gathering new with inv restores old
        old = rng.standard_normal(648)
        new = old[cg[t]]
        np.testing.assert_array_equal(new[inv], old)
        # vector signed-perm round trip: forward new[i] = old[vp[i]]*vs[i]
        fwd = vec[:, vp[t]] * vs[t]
        ivp = np.argsort(vp[t])
        back = fwd[:, ivp] * vs[t][ivp]
        np.testing.assert_array_equal(back, vec)


def test_identity_tta_matches_plain_forward(grid_ckpt):
    ckpt, cfg, wave, _ = grid_ckpt
    plain = SELDPredictor(ckpt, batch_windows=2)
    p_plain = plain.predict_waveform(wave)
    probs_plain = np.concatenate(
        list(plain._batched(_windows(plain, wave), plain._forward_probs))
    )

    tta = SELDPredictor(ckpt, batch_windows=2).tta((0,))
    p_tta = tta.predict_waveform(wave)
    probs_tta = np.concatenate(
        list(tta._batched(_windows(tta, wave), tta._forward_probs))
    )
    # identity transform: same math through a different executable
    # (f16 probs -> 1e-3 tolerance covers the cast + program noise)
    np.testing.assert_allclose(probs_tta, probs_plain, atol=2e-3)
    assert (p_tta.classes == p_plain.classes).mean() > 0.99


def _windows(pred, wave):
    """Non-overlapping window batch like predict_waveform builds."""
    from seld_tpu.data.corpus import compute_mel_features

    mel = compute_mel_features(wave, pred.cfg.features)
    win = pred.win
    n = -(-mel.shape[0] // win)
    pad = n * win - mel.shape[0]
    if pad:
        mel = np.concatenate(
            [mel, np.zeros((pad, *mel.shape[1:]), mel.dtype)], axis=0
        )
    return mel.reshape(n, win, *mel.shape[1:])


@pytest.mark.parametrize("s", [1, 5, 10])
def test_group_averaging_makes_prediction_equivariant(grid_ckpt, s):
    """Full-set TTA probs of the transformed SCENE equal the label-side
    transform of the TTA probs of the original scene."""
    ckpt, cfg, wave, _ = grid_ckpt
    pred = SELDPredictor(ckpt, batch_windows=2).tta()
    windows = _windows(pred, wave)
    probs = np.concatenate(
        list(pred._batched(windows, pred._forward_probs))
    ).astype(np.float32)

    perm, sign = audio_channel_transform(s)
    wave_s = (np.asarray(sign)[:, None] * np.asarray(wave)[perm]).astype(
        np.float32
    )
    probs_s = np.concatenate(
        list(pred._batched(_windows(pred, wave_s), pred._forward_probs))
    ).astype(np.float32)

    cg, _, _ = acs_tables(cfg.grid.n_el, cfg.grid.n_az, "mel_iv")
    expected = probs[..., cg[s]]  # label-side forward transform
    np.testing.assert_allclose(probs_s, expected, atol=2e-3)


def test_accdoa_vector_tta_equivariance(tmp_path):
    """kind='accdoa': full-set TTA vectors of a transformed scene equal
    the signed-permuted TTA vectors of the original (direct unit test of
    make_tta_forward on an untrained single-ACCDOA model)."""
    import jax
    import jax.numpy as jnp

    from seld_tpu.models import build_model, init_variables

    cfg = parse_overrides(Config(), [
        "model.model_type=accdoa_conformer", "model.conf_d_model=32",
        "model.conf_n_heads=4", "model.conf_n_layers=1",
        "model.crnn_cnn_channels=8,16", "model.compute_dtype=float32",
        "features.feature_set=mel_iv", "model.n_channels=4",
    ])
    model = build_model(cfg.model, cfg.grid)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 6, 7, 64)), jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), mel)

    fwd = make_tta_forward(
        lambda v, m: model.apply(v, m, train=False),
        cfg.grid.n_el, cfg.grid.n_az, "mel_iv", kind="accdoa",
    )
    fwd = jax.jit(fwd)
    vecs = np.asarray(fwd(variables, mel))  # (2, 6, 13, 3)

    _, ch_perm, ch_sign = acs_tables(cfg.grid.n_el, cfg.grid.n_az, "mel_iv")
    vp, vs = vector_tables("mel_iv")
    for s in (2, 7, 13):
        mel_s = jnp.take_along_axis(
            mel, jnp.asarray(ch_perm[s])[None, None, :, None], axis=2
        ) * jnp.asarray(ch_sign[s])[None, None, :, None]
        vecs_s = np.asarray(fwd(variables, mel_s))
        expected = vecs[..., vp[s]] * vs[s]  # target-side forward transform
        np.testing.assert_allclose(vecs_s, expected, atol=1e-5)


def test_rejections(grid_ckpt, tmp_path):
    ckpt, cfg, wave, _ = grid_ckpt
    # plain "mel" features carry no signed direction info
    cfg_mel = tiny_config(tmp_path, **{"train.num_epochs": 1})
    tr = synthetic_corpus(cfg_mel, n_files=1, seconds=3.0, seed=0)
    te = synthetic_corpus(cfg_mel, n_files=1, seconds=3.0, seed=1)
    train_model(cfg_mel, tr, te, workdir=tmp_path / "ckpt_mel")
    with pytest.raises(ValueError, match="mel_iv"):
        SELDPredictor(tmp_path / "ckpt_mel").tta()


def _tiny_multi_accdoa_model():
    import jax

    from seld_tpu.models import build_model, init_variables

    cfg = parse_overrides(Config(), [
        "model.model_type=multi_accdoa_conformer", "model.conf_d_model=32",
        "model.conf_n_heads=4", "model.conf_n_layers=1",
        "model.crnn_cnn_channels=8,16", "model.compute_dtype=float32",
        "features.feature_set=mel_iv", "model.n_channels=4",
    ])
    model = build_model(cfg.model, cfg.grid)
    rng = np.random.default_rng(3)
    import jax.numpy as jnp

    mel = jnp.asarray(rng.standard_normal((2, 6, 7, 64)), jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), mel)
    return cfg, model, variables, mel


def test_multi_accdoa_identity_tta_matches_plain_decode():
    """kind='multi_accdoa': identity-only TTA votes, majority-decoded,
    reproduce decode_multi_accdoa_to_grid_jnp bit-for-bit (same
    highest-class tie-break)."""
    import jax

    from seld_tpu.accdoa import (
        decode_multi_accdoa_to_grid_jnp,
        decode_vote_grid_jnp,
    )

    cfg, model, variables, mel = _tiny_multi_accdoa_model()
    out = model.apply(variables, mel, train=False)  # (2, 6, 3, 13, 3)
    assert out.ndim == 5
    plain = np.asarray(decode_multi_accdoa_to_grid_jnp(
        out, cfg.grid.n_el, cfg.grid.n_az, cfg.grid.num_classes
    ))
    fwd = jax.jit(make_tta_forward(
        lambda v, m: model.apply(v, m, train=False),
        cfg.grid.n_el, cfg.grid.n_az, "mel_iv",
        transforms=(0,), kind="multi_accdoa",
    ))
    votes = fwd(variables, mel)  # (2, 6, 13, G)
    dec = np.asarray(decode_vote_grid_jnp(votes, cfg.grid.num_classes))
    np.testing.assert_array_equal(dec, plain)


def test_multi_accdoa_vote_tta_exactly_equivariant():
    """Full-group vote maps are BITWISE equivariant: votes are sums of
    {0,1} activity maps (exact in f32 regardless of order), and by group
    closure the transformed scene evaluates the same 16 views."""
    import jax
    import jax.numpy as jnp

    cfg, model, variables, mel = _tiny_multi_accdoa_model()
    fwd = jax.jit(make_tta_forward(
        lambda v, m: model.apply(v, m, train=False),
        cfg.grid.n_el, cfg.grid.n_az, "mel_iv", kind="multi_accdoa",
    ))
    votes = np.asarray(fwd(variables, mel))  # (2, 6, 13, G)
    cg, ch_perm, ch_sign = acs_tables(cfg.grid.n_el, cfg.grid.n_az, "mel_iv")
    for s in (3, 6, 12):
        mel_s = jnp.take_along_axis(
            mel, jnp.asarray(ch_perm[s])[None, None, :, None], axis=2
        ) * jnp.asarray(ch_sign[s])[None, None, :, None]
        votes_s = np.asarray(fwd(variables, mel_s))
        np.testing.assert_array_equal(votes_s, votes[..., cg[s]])


def test_multi_accdoa_predictor_tta_and_streaming(tmp_path):
    """Predictor-level multi-ACCDOA TTA: enables without error, identity
    TTA agrees with the plain prediction, and streaming keeps offline
    bit-equality under a transform subset."""
    from conftest import train_tiny_checkpoint
    from seld_tpu.stream import stream_predict

    mcfg, ckpt = train_tiny_checkpoint(tmp_path, extra_overrides=[
        "model.model_type=multi_accdoa_conformer",
        "model.conf_d_model=32",
        "model.conf_n_layers=1",
        "features.feature_set=mel_iv",
        "targets.accdoa=true",
        "targets.accdoa_tracks=3",
    ])
    rng = np.random.default_rng(5)
    wave = (rng.standard_normal((4, 36_000)) * 0.2).astype(np.float32)

    plain = SELDPredictor(ckpt, batch_windows=1).predict_waveform(wave)
    p = SELDPredictor(ckpt, batch_windows=1).tta((0,))
    ident = p.predict_waveform(wave)
    assert (ident.classes == plain.classes).mean() > 0.99

    p_sub = SELDPredictor(ckpt, batch_windows=1).tta((0, 5, 11))
    offline = p_sub.predict_waveform(wave)
    streamed = stream_predict(p_sub, [wave[:, :10_000], wave[:, 10_000:]])
    np.testing.assert_array_equal(streamed.classes, offline.classes)

    # eval path: multi-ACCDOA TTA wires through decode_vote_grid_jnp;
    # visualizations ON — the viz second pass must use the PLAIN decoder
    # on raw vectors (regression: it once received the vote decoder)
    from seld_tpu.eval import evaluate_model

    test_c = synthetic_corpus(mcfg, n_files=1, seconds=3.0, seed=9,
                              train=False)
    m = evaluate_model(mcfg, test_c, ckpt, save_visualizations=True,
                       tta_transforms=(0, 5))
    assert np.isfinite(m["test_loss"])


def test_stream_bit_equality_under_tta(grid_ckpt):
    ckpt, cfg, wave, _ = grid_ckpt
    from seld_tpu.stream import stream_predict

    pred = SELDPredictor(ckpt, batch_windows=2).tta((0, 4, 9))
    offline = pred.predict_waveform(wave)
    sr = cfg.features.sample_rate
    chunks = np.array_split(wave, max(1, wave.shape[1] // sr), axis=1)
    streamed = stream_predict(pred, chunks)
    np.testing.assert_array_equal(streamed.classes, offline.classes)


def test_tta_composes_with_quantize(grid_ckpt):
    ckpt, cfg, wave, _ = grid_ckpt
    # tta -> quantize (quantize re-applies TTA on the quant tree)
    p1 = SELDPredictor(ckpt, batch_windows=2).tta((0, 4))
    p1.quantize(calib_waves=[wave])
    assert p1.quantized and p1._tta_transforms == (0, 4)
    out1 = p1.predict_waveform(wave)
    # quantize -> tta
    p2 = SELDPredictor(ckpt, batch_windows=2)
    p2.quantize(calib_waves=[wave])
    p2.tta((0, 4))
    out2 = p2.predict_waveform(wave)
    np.testing.assert_array_equal(out1.classes, out2.classes)


def test_cli_predict_tta(grid_ckpt, tmp_path, monkeypatch):
    ckpt, cfg, wave, wav_path = grid_ckpt
    from seld_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    rc = main([
        "predict", "--wavs", str(wav_path), "--tta-transforms", "0,8",
        "--out", str(tmp_path / "out"),
        f"data.base_path={ckpt.parent}",
        f"data.checkpoint_dirname={ckpt.name}",
    ])
    assert rc == 0
    csvs = list((tmp_path / "out" / "predictions").glob("*.csv"))
    assert len(csvs) == 1


def test_eval_tta_runs_and_identity_matches(grid_ckpt):
    ckpt, cfg, wave, _ = grid_ckpt
    from seld_tpu.eval import evaluate_model

    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1, train=False)
    plain = evaluate_model(cfg, test_c, ckpt, save_visualizations=False)
    tta_id = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                            tta_transforms=(0,))
    # identity TTA: argmax of softmax == argmax of logits (monotone)
    assert tta_id["overall_accuracy"] == pytest.approx(
        plain["overall_accuracy"], abs=0.1
    )
    full = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                          tta_transforms=(0, 1, 2, 3))
    assert "dcase2022" in full and np.isfinite(full["test_loss"])


def _tiny_kind_model(model_type: str):
    import jax
    import jax.numpy as jnp

    from seld_tpu.models import build_model, init_variables

    cfg = parse_overrides(Config(), [
        f"model.model_type={model_type}", "model.conf_d_model=32",
        "model.conf_n_heads=4", "model.conf_n_layers=1",
        "model.crnn_cnn_channels=8,16", "model.compute_dtype=float32",
        "features.feature_set=mel_iv", "model.n_channels=4",
    ])
    model = build_model(cfg.model, cfg.grid)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((2, 6, 7, 64)), jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), mel)
    return cfg, model, variables, mel


@pytest.mark.parametrize("model_type,kind", [
    ("conformer", "grid"),
    ("accdoa_conformer", "accdoa"),
    ("multi_accdoa_conformer", "multi_accdoa"),
])
def test_tta_fold_matches_unfolded(model_type, kind):
    """fold>1 packs views into the window-batch dimension; the average
    must match fold=1 up to the fixed-batch-shape executable tolerance
    (~1e-6 relative — different device batch shapes compile to slightly
    different programs; exact equality is NOT the contract across
    folds). multi-ACCDOA votes are sums of {0,1} maps, so those stay
    exactly equal."""
    import jax

    cfg, model, variables, mel = _tiny_kind_model(model_type)

    def mk(fold):
        return jax.jit(make_tta_forward(
            lambda v, m: model.apply(v, m, train=False),
            cfg.grid.n_el, cfg.grid.n_az, "mel_iv", kind=kind, fold=fold,
        ))

    base = np.asarray(mk(1)(variables, mel))
    for fold in (2, 4, 16):
        folded = np.asarray(mk(fold)(variables, mel))
        assert folded.shape == base.shape
        if kind == "multi_accdoa":
            # {0,1} vote sums are order-exact; only the forward's batch
            # shape differs, which cannot flip a hard threshold unless a
            # norm sits within float noise of it (it doesn't here)
            np.testing.assert_array_equal(folded, base)
        else:
            np.testing.assert_allclose(folded, base, rtol=2e-5, atol=2e-6)


def test_tta_fold_rejections():
    cfg, model, variables, mel = _tiny_kind_model("conformer")
    apply_fn = lambda v, m: model.apply(v, m, train=False)  # noqa: E731
    with pytest.raises(ValueError, match="must divide"):
        make_tta_forward(apply_fn, cfg.grid.n_el, cfg.grid.n_az, "mel_iv",
                         transforms=(0, 1, 2), kind="grid", fold=2)
    with pytest.raises(ValueError, match="fold must be >= 1"):
        make_tta_forward(apply_fn, cfg.grid.n_el, cfg.grid.n_az, "mel_iv",
                         kind="grid", fold=0)
    with pytest.raises(ValueError, match="does not compose"):
        make_tta_forward(apply_fn, cfg.grid.n_el, cfg.grid.n_az, "mel_iv",
                         kind="grid", fold=2, bias_sweep=[0.0, 1.0])


def test_predictor_tta_fold_stream_bit_equality(grid_ckpt):
    """Predictor-level fold: offline and streamed predictions stay
    bit-equal at a FIXED fold (the shared-forward invariant), and the
    folded prediction agrees with fold=1 on the decoded grid."""
    ckpt, cfg, wave, wav_path = grid_ckpt
    p1 = SELDPredictor(ckpt, cfg)
    p1.tta(transforms=(0, 1, 2, 3))
    base = p1.predict_waveform(wave)

    from seld_tpu.stream import stream_predict

    p2 = SELDPredictor(ckpt, cfg)
    p2.tta(transforms=(0, 1, 2, 3), fold=2)
    folded = p2.predict_waveform(wave)
    half = wave.shape[1] // 2
    streamed = stream_predict(p2, [wave[:, :half], wave[:, half:]])
    np.testing.assert_array_equal(folded.classes, streamed.classes)
    # decoded argmax is far from ties on a trained model; folds agree
    assert (folded.classes == base.classes).mean() > 0.99
