"""ACCDOA representation tests: target rasterization, vector<->grid
round-trip, model contract, and a learning smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.accdoa import (
    SELDConformerACCDOA,
    accdoa_loss,
    decode_accdoa_to_grid,
    doa_unit_vector,
    rasterize_accdoa_targets,
)
from seld_tpu.grid import cell_index, polar_to_grid


def test_doa_unit_vectors():
    v = doa_unit_vector([0, 90, 0], [0, 0, 90])
    np.testing.assert_allclose(v[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(v[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(v[2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-6)


def test_rasterize_accdoa_targets():
    frames = np.array([0, 0, 2])
    classes = np.array([3, 7, 3])
    az = np.array([0, 90, -90])
    el = np.array([0, 0, 45])
    out = rasterize_accdoa_targets(frames, classes, az, el, total_frames=12)
    assert out.shape == (12, 13, 3)
    # frame 0 fanout covers frames 0..4 for classes 3 and 7
    np.testing.assert_allclose(out[4, 3], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 7], [0, 1, 0], atol=1e-6)
    # metadata frame 2 -> label frames 10,11 (clipped)
    assert np.linalg.norm(out[10, 3]) == pytest.approx(1.0)
    # inactive pairs are zero
    assert np.linalg.norm(out[5, 3]) == 0.0
    assert np.linalg.norm(out[0, 0]) == 0.0


def test_decode_round_trip():
    # active vectors land in the same grid cell polar_to_grid assigns
    az, el = np.array([17.0, -120.0]), np.array([33.0, -60.0])
    vec = np.zeros((1, 13, 3), np.float32)
    vec[0, 2] = doa_unit_vector(az[0], el[0])
    vec[0, 9] = 0.9 * doa_unit_vector(az[1], el[1])  # activity 0.9 > 0.5
    grid = decode_accdoa_to_grid(vec)
    assert grid.shape == (1, 648)
    for a, e, cls in ((az[0], el[0], 2), (az[1], el[1], 9)):
        i, j = polar_to_grid(a, e, 18, 36)
        assert grid[0, cell_index(int(i), int(j), 36)] == cls
    # weak vectors decode to background
    vec[0, 2] *= 0.2
    grid2 = decode_accdoa_to_grid(vec)
    i, j = polar_to_grid(az[0], el[0], 18, 36)
    assert grid2[0, cell_index(int(i), int(j), 36)] == 13


def test_jnp_decoder_matches_numpy(rng):
    from seld_tpu.accdoa import decode_accdoa_to_grid_jnp

    # random vectors: some strong (active), some weak (background)
    vec = rng.standard_normal((3, 5, 13, 3)).astype(np.float32)
    vec *= rng.uniform(0.1, 1.2, (3, 5, 13, 1)).astype(np.float32)
    a = decode_accdoa_to_grid(vec)
    b = np.asarray(decode_accdoa_to_grid_jnp(jnp.asarray(vec)))
    # decoders may tie-break differently when two classes hit one cell;
    # background/active structure must agree and collisions are rare
    agree = (a == b).mean()
    assert agree > 0.999
    assert ((a == 13) == (b == 13)).mean() > 0.999


def test_model_contract_and_learning():
    model = SELDConformerACCDOA(
        cnn_channels=(8, 16), d_model=32, n_heads=4, n_layers=1
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 10, 4, 64)), jnp.float32
    )
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10, 13, 3)
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out).max()) <= 1.0  # tanh-bounded

    # a few SGD steps reduce the ACCDOA loss
    import optax

    targets = jnp.asarray(
        rasterize_accdoa_targets(
            np.array([0, 1]), np.array([3, 7]),
            np.array([10, -90]), np.array([0, 30]), total_frames=10,
        )
    )[None].repeat(2, axis=0)
    opt = optax.adam(1e-3)
    params = variables["params"]
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred, _ = model.apply(
                {"params": p, **{k: v for k, v in variables.items() if k != "params"}},
                x, train=True, mutable=["batch_stats"], rngs={"dropout": rng},
            )
            return accdoa_loss(pred, targets)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_accdoa_corpus_end_to_end(tmp_path):
    """File-based ACCDOA training: corpus builds vector targets alongside
    the grid bitmask; one window's targets decode onto the grid with the
    same cells the bitmask marks active."""
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.targets.rasterize import bitmask_to_dense

    cfg = parse_overrides(
        Config(),
        ["targets.accdoa=true", "window.window_seconds=1.0",
         f"data.base_path={tmp_path}"],
    )
    corpus = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    assert corpus.accdoa is not None
    assert corpus.accdoa.shape == (corpus.mel.shape[0], 13, 3)

    all_idx = np.arange(len(corpus))
    acc = corpus.gather_accdoa(all_idx)  # (W, 50, 13, 3)
    mel, mask = corpus.gather(all_idx)
    assert acc.shape == (len(corpus), 50, 13, 3)
    # wherever ACCDOA is active, its decoded grid cell carries that class
    # in the bitmask labels too (both come from the same metadata rows)
    grid_from_acc = decode_accdoa_to_grid(acc.reshape(-1, 13, 3))
    dense = bitmask_to_dense(mask.reshape(-1, 648))
    hits = total = 0
    for f in range(grid_from_acc.shape[0]):
        for cell in np.nonzero(grid_from_acc[f] != 13)[0]:
            total += 1
            hits += dense[f, cell, grid_from_acc[f, cell]] == 1.0
    assert total > 0 and hits == total


def test_accdoa_full_pipeline_train_and_eval(tmp_path):
    """First-class ACCDOA: model_type=accdoa_conformer through the real
    trainer and evaluator (decoded-grid metrics)."""
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import train_model

    cfg = parse_overrides(
        Config(),
        [
            "model.model_type=accdoa_conformer",
            "model.crnn_cnn_channels=8,16",
            "model.conf_d_model=32",
            "model.conf_n_layers=1",
            "model.compute_dtype=float32",
            "targets.accdoa=true",
            "window.window_seconds=1.0",
            "window.hop_seconds=0.5",
            "train.batch_size=2",
            "train.num_epochs=2",
            "train.save_every_n_epochs=1",
            f"data.base_path={tmp_path}",
        ],
    )
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    state, history = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert np.isfinite(history["train_losses"][-1])
    assert history["train_losses"][-1] < history["train_losses"][0]

    results = evaluate_model(cfg, test_c, tmp_path / "ckpt", num_visualizations=0)
    assert np.isfinite(results["test_loss"])
    assert "accdoa" in results
    assert {"ER", "F", "LE", "LR"} <= set(results["dcase"])


def test_accdoa_predictor_serving(tmp_path):
    """Predictor serves ACCDOA checkpoints: vectors decode onto the grid."""
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.data.synthetic import synthetic_raw_files
    from seld_tpu.infer import SELDPredictor
    from seld_tpu.train import train_model

    cfg = parse_overrides(
        Config(),
        [
            "model.model_type=accdoa_conformer",
            "model.crnn_cnn_channels=8,16",
            "model.conf_d_model=32",
            "model.conf_n_layers=1",
            "model.compute_dtype=float32",
            "targets.accdoa=true",
            "window.window_seconds=1.0",
            "window.hop_seconds=0.5",
            "train.batch_size=2",
            "train.num_epochs=1",
            "train.save_every_n_epochs=1",
            f"data.base_path={tmp_path}",
        ],
    )
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")

    predictor = SELDPredictor(tmp_path / "ckpt", batch_windows=2)
    assert predictor.accdoa_mode
    wavs, _ = synthetic_raw_files(tmp_path / "wav", cfg, n_files=1, seconds=1.5)
    pred = predictor.predict_file(wavs[0], csv_out=tmp_path / "out.csv")
    assert pred.classes.shape[1] == 648  # decoded onto the grid
    assert (tmp_path / "out.csv").exists()


def test_accdoa_loss_masking():
    pred = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 13, 3)),
                       jnp.float32)
    tgt = jnp.zeros((2, 4, 13, 3), jnp.float32)
    full = float(accdoa_loss(pred[:1], tgt[:1]))
    masked = float(accdoa_loss(pred, tgt, example_mask=jnp.asarray([1.0, 0.0])))
    assert masked == pytest.approx(full, rel=1e-6)

def test_accdoa_streaming_and_export(tmp_path):
    """The streaming session and the AOT export both ride the predictor's
    jitted forward — they must work for ACCDOA checkpoints too (vector
    outputs decode to int8 grids inside the jitted program)."""
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.export import export_serving, load_serving
    from seld_tpu.infer import SELDPredictor
    from seld_tpu.stream import stream_predict
    from seld_tpu.train import train_model

    cfg = parse_overrides(
        Config(),
        [
            "model.model_type=accdoa_conformer",
            "model.crnn_cnn_channels=8,16",
            "model.conf_d_model=32",
            "model.conf_n_layers=1",
            "model.compute_dtype=float32",
            "targets.accdoa=true",
            "window.window_seconds=1.0",
            "window.hop_seconds=0.5",
            "train.batch_size=2",
            "train.num_epochs=1",
            "train.save_every_n_epochs=1",
            f"data.base_path={tmp_path}",
        ],
    )
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")

    predictor = SELDPredictor(tmp_path / "ckpt", batch_windows=1)
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal((4, 40_000)) * 0.2).astype(np.float32)
    offline = predictor.predict_waveform(wave)
    streamed = stream_predict(
        predictor, [wave[:, :15_000], wave[:, 15_000:]]
    )
    np.testing.assert_array_equal(streamed.classes, offline.classes)

    out = export_serving(tmp_path / "ckpt", tmp_path / "acc.stablehlo",
                         batch_windows=1)
    fn, meta = load_serving(out)
    mel = rng.standard_normal(meta["input_shape"]).astype(np.float32)
    live = np.asarray(predictor._forward(predictor.state, mel))
    np.testing.assert_array_equal(np.asarray(fn(mel)), live)


def test_accdoa_grad_accumulation_padded_tail_is_finite():
    """Regression: an all-padding microbatch under gradient accumulation
    must not NaN-poison ACCDOA training (the em denominator is
    eps-guarded like the grid losses)."""
    import jax

    from seld_tpu.accdoa import ACCDOALossFn
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.models import build_model
    from seld_tpu.train import create_train_state, make_optimizer
    from seld_tpu.train.steps import make_train_step

    cfg = parse_overrides(Config(), [
        "model.model_type=accdoa_conformer", "model.conf_d_model=32",
        "model.conf_n_heads=4", "model.conf_n_layers=1",
        "model.crnn_cnn_channels=8,16", "model.compute_dtype=float32",
    ])
    model = build_model(cfg.model, cfg.grid)
    loss_fn = ACCDOALossFn()
    opt = make_optimizer(1e-3)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((4, 6, 4, 64)), jnp.float32)
    vec = jnp.asarray(
        rng.standard_normal((4, 6, cfg.grid.num_classes - 1, 3)) * 0.1,
        jnp.float32,
    )
    em = jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)  # mb 1 all padding
    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    step = make_train_step(model, loss_fn, opt, cfg.grid.num_classes,
                           donate=False, accum_steps=2,
                           target_decoder=lambda t: t)
    state, metrics = step(state, mel, vec, em, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()
