"""Multi-ACCDOA (ADPIT) tests: target rasterization golden cases,
permutation invariance of the loss, decoders, model contract, and an
end-to-end CLI smoke. The representation follows Shimada et al. 2022
(the DCASE2022-baseline multi-ACCDOA + ADPIT scheme); the reference has
no ACCDOA at all (SURVEY C6)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.accdoa import (
    ADPITLossFn,
    adpit_loss,
    decode_accdoa_to_grid,
    decode_multi_accdoa_to_grid,
    decode_multi_accdoa_to_grid_jnp,
    doa_unit_vector,
    rasterize_adpit_targets,
)


def rows(*tuples):
    a = np.asarray(tuples, np.int64).reshape(-1, 5)
    return a[:, 0], a[:, 1], a[:, 3], a[:, 4]


def test_adpit_targets_single_source_slot0():
    f, c, az, el = rows((0, 2, 0, 30, 10))
    t = rasterize_adpit_targets(f, c, az, el, total_frames=10)
    assert t.shape == (10, 6, 4, 13)
    v = doa_unit_vector(30, 10)
    for lf in range(5):  # 5x fanout
        assert t[lf, 0, 0, 2] == 1.0
        np.testing.assert_allclose(t[lf, 0, 1:4, 2], v, rtol=1e-6)
    assert t[:, 1:].sum() == 0  # B/C slots untouched
    assert t[5:].sum() == 0  # only meta frame 0 active


def test_adpit_targets_two_and_three_sources():
    f, c, az, el = rows(
        (0, 4, 0, 10, 0), (0, 4, 1, 50, 0),                # two sources
        (1, 7, 0, 0, 0), (1, 7, 1, 90, 0), (1, 7, 2, -90, 0),  # three
        (2, 9, 0, 0, 0), (2, 9, 1, 10, 0), (2, 9, 2, 20, 0), (2, 9, 3, 30, 0),
    )
    t = rasterize_adpit_targets(f, c, az, el, total_frames=15)
    # two sources -> slots 1, 2 only
    assert t[0, 1, 0, 4] == 1.0 and t[0, 2, 0, 4] == 1.0
    assert t[0, 0, 0, 4] == 0.0 and t[0, 3:, 0, 4].sum() == 0
    # three sources -> slots 3, 4, 5
    assert all(t[5, s, 0, 7] == 1.0 for s in (3, 4, 5))
    assert t[5, :3, 0, 7].sum() == 0
    # four sources: the 4th is dropped, first three fill C slots
    assert all(t[10, s, 0, 9] == 1.0 for s in (3, 4, 5))
    assert t[10, :, 0, 9].sum() == 3.0


def make_pred_from_slots(t, order):
    """Build a (1, T, 3, C, 3) prediction placing slot DOAs into tracks
    in the given slot order."""
    T = t.shape[0]
    pred = np.zeros((1, T, 3, 13, 3), np.float32)
    for track, s in enumerate(order):
        act = t[:, s, 0, :]  # (T, C)
        pred[0, :, track] = np.moveaxis(t[:, s, 1:4, :] * act[:, None, :], 1, -1)
    return jnp.asarray(pred)


@pytest.mark.parametrize("n_sources", [1, 2, 3])
def test_adpit_loss_zero_for_correct_any_permutation(n_sources):
    f, c, az, el = rows(*[(0, 5, s, 30 * s, 10 * s) for s in range(n_sources)])
    t = rasterize_adpit_targets(f, c, az, el, total_frames=5)
    targets = jnp.asarray(t[None])  # (1, T, 6, 4, C)
    canon = {1: (0, 0, 0), 2: (1, 1, 2), 3: (3, 4, 5)}[n_sources]
    # every permutation of the canonical track assignment is a minimum
    for order in set(itertools.permutations(canon)):
        pred = make_pred_from_slots(t, order)
        loss = float(adpit_loss(pred, targets))
        assert loss == pytest.approx(0.0, abs=1e-10), (n_sources, order)
    # a wrong prediction scores strictly worse
    wrong = jnp.zeros_like(make_pred_from_slots(t, canon)) + 0.5
    assert float(adpit_loss(wrong, targets)) > 1e-3


def test_adpit_lossfn_convention():
    targets = jnp.zeros((2, 4, 6, 4, 13))
    pred = jnp.zeros((2, 4, 3, 13, 3))
    total, breakdown = ADPITLossFn()(pred, targets, jnp.ones((2,)))
    assert float(total) == 0.0 and "adpit" in breakdown


def test_adpit_loss_example_mask():
    f, c, az, el = rows((0, 5, 0, 30, 10))
    t = rasterize_adpit_targets(f, c, az, el, total_frames=5)
    targets = jnp.asarray(np.stack([t, t]))  # (2, T, 6, 4, C)
    good = make_pred_from_slots(t, (0, 0, 0))
    bad = jnp.zeros_like(good) + 1.0
    pred = jnp.concatenate([good, bad], axis=0)
    masked = float(adpit_loss(pred, targets, jnp.asarray([1.0, 0.0])))
    assert masked == pytest.approx(0.0, abs=1e-10)
    assert float(adpit_loss(pred, targets)) > 1e-3


def test_multi_decode_same_class_two_cells():
    """Two same-class sources on different tracks decode into two grid
    cells — the capability single-ACCDOA lacks."""
    vec = np.zeros((1, 3, 13, 3), np.float32)  # (T, N, C, 3)
    vec[0, 0, 4] = doa_unit_vector(10, 0)
    vec[0, 1, 4] = doa_unit_vector(-170, 0)
    grid = decode_multi_accdoa_to_grid(vec)
    active = np.nonzero(grid[0] != 13)[0]
    assert len(active) == 2
    assert (grid[0][active] == 4).all()
    # jnp decoder agrees
    gj = np.asarray(decode_multi_accdoa_to_grid_jnp(jnp.asarray(vec)))
    np.testing.assert_array_equal(gj, grid)


def test_multi_decode_single_track_matches_single_decoder():
    rng = np.random.default_rng(0)
    vec = rng.standard_normal((2, 5, 13, 3)).astype(np.float32)
    single = decode_accdoa_to_grid(vec)
    multi = decode_multi_accdoa_to_grid(vec[:, :, None])  # N=1
    np.testing.assert_array_equal(single, multi)


def test_model_contract_and_train_smoke(tmp_path):
    """multi_accdoa_conformer emits (B, T, 3, C, 3) and the CLI trains it
    end-to-end (verify + 2 synthetic epochs + eval)."""
    from seld_tpu.cli import main
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.models import build_model, init_variables

    over = [
        f"data.base_path={tmp_path}",
        "model.model_type=multi_accdoa_conformer",
        "model.crnn_cnn_channels=8,16",
        "model.conf_d_model=32",
        "model.conf_n_heads=4",
        "model.conf_n_layers=1",
        "model.compute_dtype=float32",
        "window.window_seconds=1.0",
        "window.hop_seconds=0.5",
        "train.batch_size=4",
        "train.num_epochs=2",
        "train.save_every_n_epochs=1",
    ]
    cfg = parse_overrides(Config(), over)
    model = build_model(cfg.model, cfg.grid)
    x = jnp.zeros((2, 8, 4, 64), jnp.float32)
    v = init_variables(model, jax.random.PRNGKey(0), x)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 8, 3, 13, 3)

    assert main(["train", "--synthetic", "--eval-after", *over]) == 0
    assert (tmp_path / "checkpoints" / "best").exists()


def test_multi_accdoa_streaming_and_export(tmp_path):
    """Multi-ACCDOA (track-wise vector outputs with the multi decode fn)
    must ride the streaming and AOT-export paths unchanged."""
    import numpy as np

    from conftest import train_tiny_checkpoint
    from seld_tpu.export import export_serving, load_serving
    from seld_tpu.infer import SELDPredictor
    from seld_tpu.stream import stream_predict

    _, ckpt = train_tiny_checkpoint(tmp_path, extra_overrides=[
        "model.model_type=multi_accdoa_conformer",
        "model.conf_d_model=32",
        "model.conf_n_layers=1",
        "targets.accdoa=true",
        "targets.accdoa_tracks=3",
    ])
    p = SELDPredictor(ckpt, batch_windows=1)
    assert p.accdoa_mode
    rng = np.random.default_rng(5)
    wave = (rng.standard_normal((4, 36_000)) * 0.2).astype(np.float32)
    offline = p.predict_waveform(wave)
    streamed = stream_predict(p, [wave[:, :10_000], wave[:, 10_000:]])
    np.testing.assert_array_equal(streamed.classes, offline.classes)

    out = export_serving(ckpt, tmp_path / "m.stablehlo", batch_windows=1)
    fn, meta = load_serving(out)
    mel = rng.standard_normal(meta["input_shape"]).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(fn(mel)), np.asarray(p._forward(p.state, mel))
    )
