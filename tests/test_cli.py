"""CLI interface tests (direct main() invocation, synthetic data)."""

import json
import os

from seld_tpu.cli import main


def test_cli_verify_small():
    assert main(["verify", "--frames", "8"]) == 0


def test_cli_train_eval_predict(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    overrides = [
        f"data.base_path={tmp_path}",
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
    assert main(["train", "--synthetic", *overrides]) == 0
    assert (tmp_path / "checkpoints" / "best").exists()

    assert main(["eval", "--synthetic", "--num-visualizations", "1", *overrides]) == 0
    out = capsys.readouterr().out
    results = json.loads(out[out.index("{"):])
    assert "overall_accuracy" in results and "dcase" in results

    # predict on a generated wav
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data.synthetic import synthetic_raw_files

    cfg = parse_overrides(Config(), overrides)
    wavs, _ = synthetic_raw_files(tmp_path / "wavs", cfg, n_files=1, seconds=2.0)
    assert main(["predict", *overrides, "--wavs", wavs[0]]) == 0
    pred_csv = tmp_path / "outputs" / "predictions" / f"{os.path.basename(wavs[0])[:-4]}.csv"
    assert pred_csv.exists()

    # int8 serving flag (self-calibrates on the input clip)
    assert main(["predict", *overrides, "--wavs", wavs[0], "--int8",
                 "--out", str(tmp_path / "p8")]) == 0
    assert (tmp_path / "p8" / "predictions").exists()


def test_cli_unknown_override_fails_gracefully(tmp_path):
    assert main(["info", "train.not_a_field=1"]) == 1
