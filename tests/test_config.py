"""Config system tests: defaults match the reference constants and
dotted-path overrides / round-tripping work."""

import pytest

from seld_tpu.config import (
    Config,
    config_from_dict,
    config_to_dict,
    parse_overrides,
)


def test_defaults_match_reference_constants():
    cfg = Config()
    # ref config.py:85-92
    assert cfg.features.n_fft == int(0.04 * 24000) == 960
    assert cfg.features.hop_length == int(0.02 * 24000) == 480
    assert cfg.features.n_mels == 64
    assert cfg.features.sample_rate == 24000
    assert cfg.features.frames_per_second == 50
    # ref config.py:91-92 — 5 s window / 1 s hop in frames
    assert cfg.window.window_frames(cfg.features) == 250
    assert cfg.window.hop_frames(cfg.features) == 50
    # ref config.py:97, dataset.py:190-192
    assert cfg.grid.n_el == 18
    assert cfg.grid.n_az == 36
    assert cfg.grid.n_cells == 648
    assert cfg.grid.background_class == 13
    # ref config.py:62-82
    assert cfg.train.num_epochs == 30
    assert cfg.train.batch_size == 16
    assert cfg.train.learning_rate == 1e-3
    assert cfg.train.weight_decay == 1e-4
    assert cfg.train.lr_decay_factor == 0.5
    assert cfg.train.lr_decay_patience == 5
    assert cfg.train.patience == 20
    assert cfg.train.min_delta == 1e-4
    assert cfg.train.save_every_n_epochs == 5
    assert cfg.train.keep_last_n_checkpoints == 3
    # ref config.py:39, 71
    assert cfg.model.model_type == "resnet_conformer"
    assert cfg.loss.loss_type == "mse"
    # ref targets fanout: 100 ms metadata -> 5x 20 ms label frames
    assert cfg.targets.fanout == 5


def test_overrides():
    cfg = parse_overrides(
        Config(),
        [
            "train.batch_size=8",
            "model.model_type=crnn",
            "loss.use_aiur=true",
            "features.use_pallas=false",
            "model.crnn_cnn_channels=32,64",
        ],
    )
    assert cfg.train.batch_size == 8
    assert cfg.model.model_type == "crnn"
    assert cfg.loss.use_aiur is True
    assert cfg.features.use_pallas is False
    assert cfg.model.crnn_cnn_channels == (32, 64)


def test_bad_override_raises():
    with pytest.raises(KeyError):
        parse_overrides(Config(), ["train.nonexistent=1"])
    with pytest.raises(ValueError):
        parse_overrides(Config(), ["no_equals_sign"])


def test_round_trip_dict():
    cfg = parse_overrides(Config(), ["model.conf_n_layers=3", "train.seed=7"])
    d = config_to_dict(cfg)
    cfg2 = config_from_dict(d)
    assert cfg2 == cfg
