"""SpecAugment (seld_tpu/features/specaugment.py): mask geometry,
fill-value semantics, determinism, and train-step integration."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.features.specaugment import make_spec_augment, spec_augment


def _mel(b=3, t=40, c=4, f=16, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, t, c, f)) + 2.0


def test_disabled_is_identity():
    mel = _mel()
    out = spec_augment(jax.random.PRNGKey(1), mel, 0, 10, 0, 4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mel))


def test_time_masks_span_full_rows():
    mel = _mel()
    out = np.asarray(spec_augment(jax.random.PRNGKey(2), mel, 2, 10, 0, 0))
    ref = np.asarray(mel)
    fill = ref.mean(axis=(1, 3))  # (B, C) per-sample per-channel
    for b in range(ref.shape[0]):
        # every frame is either untouched or entirely filled with the
        # channel's own mean
        changed = ~np.isclose(out[b], ref[b])
        frames_changed = changed.any(axis=(1, 2))
        for ti in np.nonzero(frames_changed)[0]:
            for c in range(ref.shape[2]):
                np.testing.assert_allclose(out[b, ti, c], fill[b, c], rtol=1e-5)
        # masked frames bounded by n_masks * max_width
        assert frames_changed.sum() <= 2 * 10


def test_freq_masks_span_full_columns():
    mel = _mel()
    out = np.asarray(spec_augment(jax.random.PRNGKey(3), mel, 0, 0, 2, 4))
    ref = np.asarray(mel)
    for b in range(ref.shape[0]):
        changed = ~np.isclose(out[b], ref[b])
        bins_changed = changed.any(axis=(0, 1))
        assert bins_changed.sum() <= 2 * 4
        for fi in np.nonzero(bins_changed)[0]:
            # the whole column is filled wherever changed at all
            col = changed[:, :, fi]
            assert col.all() or not col.any() or col.all(axis=1).all()


def test_deterministic_per_key_and_varies_across_keys():
    mel = _mel()
    a = np.asarray(spec_augment(jax.random.PRNGKey(4), mel, 2, 8, 2, 4))
    b = np.asarray(spec_augment(jax.random.PRNGKey(4), mel, 2, 8, 2, 4))
    c = np.asarray(spec_augment(jax.random.PRNGKey(5), mel, 2, 8, 2, 4))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_make_spec_augment_from_config(tmp_path):
    from seld_tpu.config import Config, parse_overrides

    cfg = parse_overrides(Config(), [
        "train.specaugment_time_masks=2",
        "train.specaugment_freq_masks=1",
    ])
    hook = make_spec_augment(cfg.train)
    assert hook is not None
    mel = _mel()
    out = hook(jax.random.PRNGKey(0), mel)
    assert out.shape == mel.shape
    assert make_spec_augment(Config().train) is None  # off by default


def test_train_step_with_specaugment_reduces_loss(tmp_path):
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model
    from seld_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = parse_overrides(Config(), [
        "model.model_type=crnn",
        "model.crnn_cnn_channels=8,16",
        "model.crnn_rnn_hidden=16",
        "model.crnn_rnn_layers=1",
        "model.compute_dtype=float32",
        "window.window_seconds=1.0",
        "window.hop_seconds=0.5",
        "train.specaugment_time_masks=2",
        "train.specaugment_freq_masks=2",
        f"data.base_path={tmp_path}",
    ])
    corpus = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    mel, mask = corpus.gather(np.arange(2))
    mel, mask = jnp.asarray(mel), jnp.asarray(mask)
    em = jnp.ones((2,), jnp.float32)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    step = make_train_step(
        model, loss_fn, opt, cfg.grid.num_classes, donate=False,
        input_augment=make_spec_augment(cfg.train),
    )
    losses = []
    for i in range(6):
        state, metrics = step(state, mel, mask, em, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0]
