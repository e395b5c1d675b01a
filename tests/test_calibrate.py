"""`seld_tpu calibrate` + --calibration consumption.

The reference's eval (/root/reference/trainer.py:394-711) has exactly
one decode — plain argmax; calibrate tunes the decode operating-point
knobs seld_tpu adds on top of that contract (bg_bias / accdoa_threshold
/ median_filter, optionally under the TTA/int8 paths) and the
--calibration flag replays them on predict/eval/export."""

import argparse
import json
import os

import pytest

from seld_tpu.cli import main

GRID_OVERRIDES = [
    "model.model_type=crnn",
    "model.crnn_cnn_channels=8,16",
    "model.crnn_rnn_hidden=16",
    "model.crnn_rnn_layers=1",
    "model.compute_dtype=float32",
    "window.window_seconds=1.0",
    "window.hop_seconds=0.5",
    "train.batch_size=2",
    "train.num_epochs=1",
    "train.save_every_n_epochs=1",
]

ACCDOA_OVERRIDES = [
    "model.model_type=accdoa_conformer",
    "model.crnn_cnn_channels=8,16",
    "model.conf_d_model=32",
    "model.conf_n_layers=1",
    "model.conf_n_heads=4",
    "model.compute_dtype=float32",
    "window.window_seconds=1.0",
    "window.hop_seconds=0.5",
    "train.batch_size=2",
    "train.num_epochs=1",
    "train.save_every_n_epochs=1",
]


def _train(tmp_path_factory, name, model_overrides):
    root = tmp_path_factory.mktemp(name)
    overrides = [f"data.base_path={root}", *model_overrides]
    cwd = os.getcwd()
    os.chdir(root)
    try:
        assert main(["train", "--synthetic", *overrides]) == 0
    finally:
        os.chdir(cwd)
    return root, overrides


@pytest.fixture(scope="module")
def grid_ckpt(tmp_path_factory):
    return _train(tmp_path_factory, "calib_grid", GRID_OVERRIDES)


@pytest.fixture(scope="module")
def grid_calibration(grid_ckpt):
    root, overrides = grid_ckpt
    assert main([
        "calibrate", "--synthetic", *overrides,
        "--bg-bias-sweep=0,0.5", "--median-widths", "1,3",
    ]) == 0
    path = root / "checkpoints" / "decode_calibration.json"
    assert path.exists()
    return path, json.loads(path.read_text())


def test_calibrate_grid_file_contents(grid_calibration):
    _, calib = grid_calibration
    assert calib["calibration_version"] == 1
    assert calib["model_type"] == "crnn"
    assert calib["bg_bias"] in (0.0, 0.5)
    assert "accdoa_threshold" not in calib
    assert calib["median_filter"] in (1, 3)
    assert calib["tta"] is False and calib["int8"] is False
    # audit trail: both sweep tables, one row per candidate
    assert calib["knob_sweep"]["knob"] == "bg_bias"
    assert len(calib["knob_sweep"]["metrics"]) == 2
    assert set(calib["median_sweep"]["metrics"]) == {"1", "3"}
    # the recorded val metrics are the chosen median row's metrics
    chosen = calib["median_sweep"]["metrics"][str(calib["median_filter"])]
    assert calib["val_metrics"] == chosen
    assert "SELD_error" in calib["val_metrics"]


def test_eval_consumes_calibration(grid_ckpt, grid_calibration, capsys):
    root, overrides = grid_ckpt
    path, calib = grid_calibration
    assert main([
        "eval", "--synthetic", *overrides,
        "--num-visualizations", "0", "--calibration", str(path),
    ]) == 0
    out = capsys.readouterr().out
    results = json.loads(out[out.index("{"):])
    assert results["bg_bias"] == calib["bg_bias"]
    assert results["median_filter"] == calib["median_filter"]


def test_explicit_flags_override_calibration(grid_ckpt, grid_calibration,
                                             capsys):
    root, overrides = grid_ckpt
    path, calib = grid_calibration
    assert main([
        "eval", "--synthetic", *overrides, "--num-visualizations", "0",
        "--calibration", str(path), "--bg-bias=-0.25", "--median-filter", "5",
    ]) == 0
    out = capsys.readouterr().out
    results = json.loads(out[out.index("{"):])
    assert results["bg_bias"] == -0.25
    assert results["median_filter"] == 5


def test_explicit_zero_overrides_calibration(grid_ckpt, grid_calibration,
                                             tmp_path, capsys):
    """An explicit `--bg-bias 0 --median-filter 0` must win over the
    calibration file (flag defaults are None, so 0 is distinguishable
    from unset — regression for the falsy-zero check). The calibration
    is forced to NONZERO knobs so the assertion cannot pass vacuously."""
    root, overrides = grid_ckpt
    path, calib = grid_calibration
    forced = dict(calib, bg_bias=1.0, median_filter=3)
    fpath = tmp_path / "forced_calib.json"
    fpath.write_text(json.dumps(forced))
    assert main([
        "eval", "--synthetic", *overrides, "--num-visualizations", "0",
        "--calibration", str(fpath), "--bg-bias=0", "--median-filter", "0",
    ]) == 0
    out = capsys.readouterr().out
    results = json.loads(out[out.index("{"):])
    assert results["bg_bias"] == 0.0
    assert results["median_filter"] == 0


def test_calibrate_stamps_checkpoint_model(grid_ckpt):
    """The knob family and the stamped model_type follow the
    checkpoint-embedded config (what evaluate_model actually runs),
    not the caller's CLI config — otherwise a calibration written with
    an unstated model type would be rejected by its own --calibration
    replay against the very checkpoint it was tuned on."""
    root, overrides = grid_ckpt
    # drop the model.* overrides: the CLI config defaults to
    # resnet_conformer, but the checkpoint stores the tiny crnn
    no_model = [o for o in overrides if not o.startswith("model.")]
    assert main([
        "calibrate", "--synthetic", *no_model,
        "--bg-bias-sweep=0,0.5", "--median-widths", "1",
        "--out", str(root / "stamp_check.json"),
    ]) == 0
    calib = json.loads((root / "stamp_check.json").read_text())
    assert calib["model_type"] == "crnn"


def test_predict_calibration_equals_explicit(grid_ckpt, grid_calibration,
                                             tmp_path, monkeypatch):
    """predict --calibration is bit-equal to passing the tuned knobs
    explicitly (the file is plumbing, not a different decode)."""
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data.synthetic import synthetic_raw_files

    root, overrides = grid_ckpt
    path, calib = grid_calibration
    monkeypatch.chdir(root)
    cfg = parse_overrides(Config(), overrides)
    wavs, _ = synthetic_raw_files(tmp_path / "wavs", cfg, n_files=1,
                                  seconds=2.0)
    assert main(["predict", *overrides, "--wavs", wavs[0],
                 "--calibration", str(path),
                 "--out", str(tmp_path / "via_calib")]) == 0
    assert main(["predict", *overrides, "--wavs", wavs[0],
                 f"--bg-bias={calib['bg_bias']}",
                 "--median-filter", str(calib["median_filter"]),
                 "--out", str(tmp_path / "via_flags")]) == 0
    name = os.path.basename(wavs[0])[:-4] + ".csv"
    a = (tmp_path / "via_calib" / "predictions" / name).read_bytes()
    b = (tmp_path / "via_flags" / "predictions" / name).read_bytes()
    assert a == b


def test_calibrate_accdoa_threshold(tmp_path_factory, capsys):
    root, overrides = _train(tmp_path_factory, "calib_accdoa",
                             ACCDOA_OVERRIDES)
    assert main([
        "calibrate", "--synthetic", *overrides,
        "--accdoa-threshold-sweep=0.4,0.6", "--median-widths", "1",
    ]) == 0
    path = root / "checkpoints" / "decode_calibration.json"
    calib = json.loads(path.read_text())
    assert calib["model_type"] == "accdoa_conformer"
    assert calib["accdoa_threshold"] in (0.4, 0.6)
    assert "bg_bias" not in calib
    assert calib["knob_sweep"]["knob"] == "accdoa_threshold"
    capsys.readouterr()  # drain calibrate's own JSON before parsing eval's
    # consumption: eval applies the threshold
    assert main([
        "eval", "--synthetic", *overrides,
        "--num-visualizations", "0", "--calibration", str(path),
    ]) == 0
    out = capsys.readouterr().out
    results = json.loads(out[out.index("{"):])
    assert results["accdoa_threshold"] == calib["accdoa_threshold"]


def test_bias_grid_rejected_for_accdoa():
    """Family/knob mismatches are named errors, not silent defaults."""
    from seld_tpu.calibrate import run_calibration
    from seld_tpu.config import Config, parse_overrides

    cfg = parse_overrides(Config(), ["model.model_type=accdoa_conformer"])
    with pytest.raises(ValueError, match="grid models only"):
        run_calibration(cfg, None, "unused", bias_grid=[0.5])
    cfg = parse_overrides(Config(), ["model.model_type=crnn"])
    with pytest.raises(ValueError, match="ACCDOA families only"):
        run_calibration(cfg, None, "unused", threshold_grid=[0.5])


def test_wrong_model_type_rejected(grid_ckpt, grid_calibration, tmp_path):
    root, overrides = grid_ckpt
    path, calib = grid_calibration
    bad = dict(calib, model_type="resnet_conformer")
    bad_path = tmp_path / "bad_calib.json"
    bad_path.write_text(json.dumps(bad))
    # main() catches the ValueError and returns exit code 1
    assert main([
        "eval", "--synthetic", *overrides,
        "--num-visualizations", "0", "--calibration", str(bad_path),
    ]) == 1


def test_load_calibration_validation(tmp_path):
    from seld_tpu.calibrate import load_calibration

    with pytest.raises(FileNotFoundError):
        load_calibration(tmp_path / "missing.json")
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"calibration_version": 99}))
    with pytest.raises(ValueError, match="calibration_version"):
        load_calibration(p)
    p.write_text(json.dumps({
        "calibration_version": 1, "model_type": "crnn",
        "median_filter": 3,
    }))
    with pytest.raises(ValueError, match="exactly one operating-point"):
        load_calibration(p)
    p.write_text(json.dumps({
        "calibration_version": 1, "model_type": "crnn",
        "median_filter": 3, "bg_bias": 0.5, "accdoa_threshold": 0.4,
    }))
    with pytest.raises(ValueError, match="exactly one operating-point"):
        load_calibration(p)


def test_calibration_rejected_with_artifact(grid_calibration):
    """--calibration + --artifact is a named error (the artifact already
    carries its baked decode; export --calibration is the path)."""
    from seld_tpu.cli import _apply_calibration
    from seld_tpu.config import Config
    from seld_tpu.utils.logging import get_logger

    path, _ = grid_calibration
    args = argparse.Namespace(calibration=str(path), artifact="x.shlo")
    with pytest.raises(ValueError, match="does not compose with --artifact"):
        _apply_calibration(Config(), args, get_logger())


def test_tta_calibration_rejected_without_tta_support(grid_calibration,
                                                      tmp_path):
    """A TTA-path calibration cannot be applied by a command with no TTA
    surface (export): per-path optima differ, so silently applying the
    scalar knobs would serve a miscalibrated decode."""
    from seld_tpu.calibrate import load_calibration
    from seld_tpu.cli import _apply_calibration
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.utils.logging import get_logger

    path, calib = grid_calibration
    tta_calib = dict(calib, tta=True, tta_transforms=[0, 1])
    p = tmp_path / "tta_calib.json"
    p.write_text(json.dumps(tta_calib))
    # base_path at tmp_path: no checkpoint tree there, so the match
    # check runs against this CLI cfg (not a stray ./checkpoints)
    cfg = parse_overrides(Config(), ["model.model_type=crnn",
                                     f"data.base_path={tmp_path}"])
    # export-like namespace: no `tta` attribute
    args = argparse.Namespace(calibration=str(p), bg_bias=0.0,
                              accdoa_threshold=None, median_filter=0,
                              int8_calib_wavs=None, int8_weight_only=False)
    with pytest.raises(ValueError, match="tuned under TTA"):
        _apply_calibration(cfg, args, get_logger())
    # predict-like namespace: TTA turns on with the recorded subset
    args = argparse.Namespace(calibration=str(p), bg_bias=0.0,
                              accdoa_threshold=None, median_filter=None,
                              tta=False, tta_transforms=None, int8=False,
                              artifact=None)
    _apply_calibration(cfg, args, get_logger())
    assert args.tta is True and args.tta_transforms == "0,1"
    assert args.bg_bias == calib["bg_bias"]
    assert args.median_filter == calib["median_filter"]
    assert load_calibration(p)["tta_transforms"] == [0, 1]
