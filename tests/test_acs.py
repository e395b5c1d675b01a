"""FOA spatial augmentation (ACS): exactness + consistency contracts.

The load-bearing test is audio/feature commutation: transforming the
RAW FOA channels and then extracting mel_iv features must equal
extracting features first and applying the feature-side signed channel
permutation — for every one of the 16 transforms. That grounds the
feature tables in physics without needing real directional recordings;
the angle-table test then ties the label permutation to the same
transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.features.acs import (
    N_TRANSFORMS,
    acs_tables,
    audio_channel_transform,
    make_acs_augment,
    transform_angles,
    transform_params,
)
from seld_tpu.grid import cell_centers, polar_to_grid

N_EL, N_AZ, G = 18, 36, 648


def test_transform_zero_is_identity():
    assert transform_params(0) == (0, 1, 1)
    cg, cp, cs = acs_tables(N_EL, N_AZ)
    np.testing.assert_array_equal(cg[0], np.arange(G))
    np.testing.assert_array_equal(cp[0], np.arange(7))
    np.testing.assert_array_equal(cs[0], np.ones(7))


def test_cell_tables_are_bijections_and_involutions():
    cg, _, _ = acs_tables(N_EL, N_AZ)
    for t in range(N_TRANSFORMS):
        assert len(np.unique(cg[t])) == G
    # azimuth reflection (t=4) and elevation flip (t=8) are involutions
    for t in (4, 8):
        np.testing.assert_array_equal(cg[t][cg[t]], np.arange(G))
    # rotation by 90 (t=1) four times = identity
    p = np.arange(G)
    for _ in range(4):
        p = cg[1][p]
    np.testing.assert_array_equal(p, np.arange(G))


def test_audio_feature_commutation_bitexact():
    """extract(transform_audio(a)) == transform_features(extract(a))."""
    from seld_tpu.features.spatial import extract_feature_frames

    rng = np.random.default_rng(0)
    frames = rng.standard_normal((4, 6, 960)).astype(np.float32)
    _, cp, cs = acs_tables(N_EL, N_AZ)

    base = np.asarray(extract_feature_frames(
        jnp.asarray(frames), "mel_iv", 960, 64, 24000))  # (T, 7, F)

    for t in range(N_TRANSFORMS):
        perm, sign = audio_channel_transform(t)
        audio_t = sign[:, None, None] * frames[perm]
        want = np.asarray(extract_feature_frames(
            jnp.asarray(audio_t), "mel_iv", 960, 64, 24000))
        got = cs[t][None, :, None] * base[:, cp[t], :]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"transform {t}")


def test_label_perm_matches_angle_transform():
    """cell_gather must realize exactly the angle map used for audio:
    an event at cell(az, el) lands at cell(transform(az, el))."""
    cg, _, _ = acs_tables(N_EL, N_AZ)
    el_c, az_c = cell_centers(N_EL, N_AZ)
    el_grid = np.repeat(el_c, N_AZ)
    az_grid = np.tile(az_c, N_EL)
    for t in range(N_TRANSFORMS):
        az2, el2 = transform_angles(az_grid, el_grid, t)
        i2, j2 = polar_to_grid(az2, el2, N_EL, N_AZ)
        fwd = np.asarray(i2, np.int64) * N_AZ + np.asarray(j2, np.int64)
        # mask gathered with cg[t] puts old cell c at new cell fwd[c]
        old = np.arange(G)
        gathered = old[cg[t]]  # value at new cell = old cell index
        np.testing.assert_array_equal(gathered[fwd], old, err_msg=f"t={t}")


def test_iv_rotation_matches_angle_transform():
    """The IV-channel signed permutation rotates direction vectors the
    same way the angle transform moves labels (catches sign/direction
    mismatches between the two sides)."""
    _, cp, cs = acs_tables(N_EL, N_AZ)
    rng = np.random.default_rng(1)
    for t in range(N_TRANSFORMS):
        for _ in range(20):
            az = float(rng.uniform(-170, 170))
            el = float(rng.uniform(-80, 80))
            d = np.array([
                np.cos(np.deg2rad(el)) * np.cos(np.deg2rad(az)),  # x
                np.cos(np.deg2rad(el)) * np.sin(np.deg2rad(az)),  # y
                np.sin(np.deg2rad(el)),                            # z
            ])
            # feature-side: IV channels live at indices 4, 5, 6
            iv = np.zeros(7)
            iv[4:7] = d
            iv_t = cs[t] * iv[cp[t]]
            az2, el2 = transform_angles(az, el, t)
            want = np.array([
                np.cos(np.deg2rad(el2)) * np.cos(np.deg2rad(az2)),
                np.cos(np.deg2rad(el2)) * np.sin(np.deg2rad(az2)),
                np.sin(np.deg2rad(el2)),
            ])
            np.testing.assert_allclose(iv_t[4:7], want, atol=1e-12,
                                       err_msg=f"t={t} az={az} el={el}")


def test_make_acs_augment_moves_events_with_features():
    aug = make_acs_augment(N_EL, N_AZ, "mel_iv")
    b, T, g = 4, 6, G
    feats = jnp.asarray(np.random.default_rng(2).standard_normal(
        (b, T, 7, 64)), jnp.float32)
    mask = jnp.zeros((b, T, g), jnp.uint16).at[:, :, 100].set(1 << 5)
    f2, m2 = aug(jax.random.PRNGKey(0), feats, mask)
    assert f2.shape == feats.shape and m2.shape == mask.shape
    # every sample still has exactly one active cell per frame
    assert int((np.asarray(m2) != 0).sum()) == b * T
    # deterministic under the same key
    f3, m3 = aug(jax.random.PRNGKey(0), feats, mask)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m3))
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(f3))


def test_acs_rejects_unsigned_feature_sets():
    with pytest.raises(ValueError, match="signed spatial features"):
        acs_tables(N_EL, N_AZ, "mel")
    with pytest.raises(ValueError, match="signed spatial features"):
        acs_tables(N_EL, N_AZ, "mel_gcc")


def test_trainer_integration(tmp_path):
    """A tiny mel_iv training run with ACS on runs end to end; ACS with
    plain mel or ACCDOA errors out with named messages."""
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.train import train_model

    cfg = parse_overrides(Config(), [
        "model.model_type=crnn", "model.crnn_cnn_channels=8,16",
        "model.crnn_rnn_hidden=16", "model.crnn_rnn_layers=1",
        "model.compute_dtype=float32",
        "features.feature_set=mel_iv",
        "window.window_seconds=1.0", "window.hop_seconds=0.5",
        "train.batch_size=4", "train.num_epochs=1",
        "train.acs_augment=true",
        f"data.base_path={tmp_path}",
    ])
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1)
    _, history = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert np.isfinite(history["train_losses"][0])

    bad = parse_overrides(cfg, ["features.feature_set=mel"])
    bad_c = synthetic_corpus(bad, n_files=1, seconds=2.0, seed=0)
    with pytest.raises(ValueError, match="signed spatial features"):
        train_model(bad, bad_c, bad_c, workdir=tmp_path / "ckpt2")


def test_accdoa_vector_rotation_matches_angle_transform():
    from seld_tpu.features.acs import vector_tables

    vp, vs = vector_tables()
    rng = np.random.default_rng(3)
    for t in range(N_TRANSFORMS):
        for _ in range(10):
            az = float(rng.uniform(-170, 170))
            el = float(rng.uniform(-80, 80))
            d = np.array([
                np.cos(np.deg2rad(el)) * np.cos(np.deg2rad(az)),
                np.cos(np.deg2rad(el)) * np.sin(np.deg2rad(az)),
                np.sin(np.deg2rad(el)),
            ])
            got = vs[t] * d[vp[t]]
            az2, el2 = transform_angles(az, el, t)
            want = np.array([
                np.cos(np.deg2rad(el2)) * np.cos(np.deg2rad(az2)),
                np.cos(np.deg2rad(el2)) * np.sin(np.deg2rad(az2)),
                np.sin(np.deg2rad(el2)),
            ])
            np.testing.assert_allclose(got, want, atol=1e-12, err_msg=f"t={t}")


def test_accdoa_and_adpit_augment_shapes_and_activity():
    from seld_tpu.features.acs import make_acs_augment_accdoa

    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((4, 6, 7, 64)), jnp.float32)
    # single ACCDOA: unit vectors for one active class
    acc = np.zeros((4, 6, 13, 3), np.float32)
    acc[:, :, 5] = [0.6, 0.8, 0.0]
    aug = make_acs_augment_accdoa("mel_iv", multi=False)
    f2, a2 = aug(jax.random.PRNGKey(1), feats, jnp.asarray(acc))
    a2 = np.asarray(a2)
    # norms preserved; only class 5 active
    np.testing.assert_allclose(np.linalg.norm(a2[:, :, 5], axis=-1), 1.0,
                               rtol=1e-6)
    assert np.abs(a2[:, :, :5]).max() == 0.0

    # ADPIT: activity channel must never change
    adp = np.zeros((4, 6, 6, 4, 13), np.float32)
    adp[:, :, 0, 0, 5] = 1.0             # activity
    adp[:, :, 0, 1:4, 5] = np.array([0.6, 0.8, 0.0])[:, None][:, 0]
    adp[:, :, 0, 1, 5], adp[:, :, 0, 2, 5], adp[:, :, 0, 3, 5] = 0.6, 0.8, 0.0
    aug_m = make_acs_augment_accdoa("mel_iv", multi=True)
    f3, m3 = aug_m(jax.random.PRNGKey(2), feats, jnp.asarray(adp))
    m3 = np.asarray(m3)
    np.testing.assert_array_equal(m3[:, :, 0, 0, 5], adp[:, :, 0, 0, 5])
    np.testing.assert_allclose(
        np.linalg.norm(m3[:, :, 0, 1:4, 5], axis=-1), 1.0, rtol=1e-6)


def test_trainer_integration_accdoa(tmp_path):
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.train import train_model

    cfg = parse_overrides(Config(), [
        "model.model_type=accdoa_conformer",
        "model.conf_d_model=32", "model.conf_n_heads=4",
        "model.conf_n_layers=1", "model.compute_dtype=float32",
        "features.feature_set=mel_iv", "targets.accdoa=true",
        "window.window_seconds=1.0", "window.hop_seconds=0.5",
        "train.batch_size=4", "train.num_epochs=1",
        "train.acs_augment=true",
        f"data.base_path={tmp_path}",
    ])
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1)
    _, history = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert np.isfinite(history["train_losses"][0])
