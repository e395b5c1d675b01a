"""AOT serving export (seld_tpu/export.py): a checkpoint becomes a
self-contained StableHLO artifact whose outputs match the live predictor
bit-for-bit, loadable without model code."""

from __future__ import annotations

import json

import jax
import numpy as np
import pytest

from seld_tpu.export import export_serving, load_serving
from seld_tpu.infer import SELDPredictor


@pytest.fixture(scope="module")
def ckpt_dir(tiny_crnn_ckpt):
    return tiny_crnn_ckpt  # session-shared tiny checkpoint (conftest)


def test_export_roundtrip_matches_predictor(ckpt_dir, tmp_path):
    out = export_serving(ckpt_dir, tmp_path / "model.stablehlo",
                         batch_windows=2)
    assert out.exists() and out.stat().st_size > 1000
    sidecar = json.loads((tmp_path / "model.stablehlo.json").read_text())
    assert sidecar["model_type"] == "crnn"
    assert sidecar["input_shape"][0] == 2

    fn, meta = load_serving(out)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal(sidecar["input_shape"]).astype(np.float32)

    p = SELDPredictor(ckpt_dir, batch_windows=2)
    live = np.asarray(p._forward(p.state, mel))
    exported = np.asarray(fn(mel))
    assert exported.dtype == np.int8
    np.testing.assert_array_equal(exported, live)


def test_cli_export(ckpt_dir, tmp_path):
    from seld_tpu.cli import main

    rc = main([
        "export", f"data.base_path={ckpt_dir.parent}",
        "--out", str(tmp_path / "m.stablehlo"), "--batch-windows", "1",
    ])
    assert rc == 0
    assert (tmp_path / "m.stablehlo").exists()
    assert (tmp_path / "m.stablehlo.json").exists()


def test_export_artifact_is_model_code_free(ckpt_dir, tmp_path):
    """Deserialization path must not need seld_tpu model classes: load in
    a subprocess that never imports seld_tpu.models/flax model code."""
    import subprocess
    import sys

    out = export_serving(ckpt_dir, tmp_path / "standalone.stablehlo",
                         batch_windows=1)
    code = f"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from jax import export as jexport
import numpy as np
exp = jexport.deserialize(open(r"{out}", "rb").read())
mel = np.zeros({json.loads((tmp_path / "standalone.stablehlo.json").read_text())["input_shape"]}, np.float32)
y = np.asarray(exp.call(mel))
assert y.dtype == np.int8 and y.ndim == 3
assert "seld_tpu" not in sys.modules and "flax" not in sys.modules
print("STANDALONE OK", y.shape)
"""
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "STANDALONE OK" in r.stdout


def test_int8_export_roundtrip(ckpt_dir, tmp_path):
    """Int8-quantized export: the artifact bakes the int8 weights/scales
    and reproduces the quantized predictor bit-for-bit without any
    seld_tpu code on the loading side."""
    rng = np.random.default_rng(0)
    calib = [rng.standard_normal((4, 24000)).astype(np.float32) * 0.1]
    out = export_serving(
        ckpt_dir, tmp_path / "model_int8.stablehlo", batch_windows=2,
        int8_calib_waves=calib,
    )
    sidecar = json.loads((tmp_path / "model_int8.stablehlo.json").read_text())
    assert sidecar["quantized_int8"] is True

    p = SELDPredictor(ckpt_dir, batch_windows=2)
    p.quantize(calib_waves=calib)
    mel = rng.standard_normal(sidecar["input_shape"]).astype(np.float32)
    live = np.asarray(p._forward(p.state, mel))
    fn, _ = load_serving(out)
    exported = np.asarray(fn(mel))
    np.testing.assert_array_equal(exported, live)


def test_from_artifact_predictor_matches_checkpoint(ckpt_dir, tmp_path):
    """SELDPredictor.from_artifact serves every offline mode bit-equal to
    the checkpoint-backed predictor: plain tiling, overlapped probability
    averaging (via the .probs artifact), and streaming sessions."""
    out = export_serving(ckpt_dir, tmp_path / "full.stablehlo",
                         batch_windows=2)
    assert (tmp_path / "full.stablehlo.probs").exists()
    sidecar = json.loads((tmp_path / "full.stablehlo.json").read_text())
    assert sidecar["has_probs"] and sidecar["batch_windows"] == 2
    assert sidecar["config"]["model"]["model_type"] == "crnn"

    live = SELDPredictor(ckpt_dir, batch_windows=2)
    art = SELDPredictor.from_artifact(out)
    assert art.batch_windows == 2 and art.win == live.win
    assert art.cfg.features == live.cfg.features

    rng = np.random.default_rng(1)
    sr = live.cfg.features.sample_rate
    wave = (rng.standard_normal((4, 3 * sr)) * 0.1).astype(np.float32)
    np.testing.assert_array_equal(
        art.predict_waveform(wave).classes,
        live.predict_waveform(wave).classes,
    )
    np.testing.assert_array_equal(
        art.predict_waveform(wave, overlap=0.5).classes,
        live.predict_waveform(wave, overlap=0.5).classes,
    )
    # streaming through the artifact predictor stays bit-equal too
    from seld_tpu.stream import stream_predict

    chunk = sr // 2
    streamed = stream_predict(
        art, (wave[:, i : i + chunk] for i in range(0, wave.shape[1], chunk))
    )
    np.testing.assert_array_equal(
        streamed.classes, live.predict_waveform(wave).classes
    )
    # int8 is baked at export time — re-quantization must refuse
    with pytest.raises(RuntimeError, match="baked at export"):
        art.quantize(calib_waves=[wave])


def test_cli_predict_from_artifact(ckpt_dir, tmp_path):
    """predict --artifact writes the same CSV as predict from the
    checkpoint; --int8 with --artifact is rejected."""
    from seld_tpu.cli import main
    from seld_tpu.data.synthetic import synthetic_raw_files

    from seld_tpu.config import Config

    from pathlib import Path

    wav = Path(synthetic_raw_files(tmp_path / "wavs", Config(), n_files=1,
                                   seconds=2.0, seed=3)[0][0])
    rc = main([
        "export", f"data.base_path={ckpt_dir.parent}",
        "--out", str(tmp_path / "m.stablehlo"), "--batch-windows", "2",
    ])
    assert rc == 0
    rc = main([
        "predict", f"data.base_path={ckpt_dir.parent}",
        "--wavs", str(wav), "--out", str(tmp_path / "from_ckpt"),
    ])
    assert rc == 0
    rc = main([
        "predict", f"data.base_path={ckpt_dir.parent}",
        "--artifact", str(tmp_path / "m.stablehlo"),
        "--wavs", str(wav), "--out", str(tmp_path / "from_artifact"),
    ])
    assert rc == 0
    name = wav.stem + ".csv"
    got = (tmp_path / "from_artifact" / "predictions" / name).read_text()
    want = (tmp_path / "from_ckpt" / "predictions" / name).read_text()
    assert got == want
    rc = main([
        "predict", f"data.base_path={ckpt_dir.parent}",
        "--artifact", str(tmp_path / "m.stablehlo"), "--int8",
        "--wavs", str(wav),
    ])
    assert rc == 1  # named error, nonzero exit


def test_predict_artifact_median_filter_zero_overrides_sidecar(
    ckpt_dir, tmp_path
):
    """A width baked at export time (sidecar) applies by default in
    from_artifact, and `predict --artifact --median-filter 0` DISABLES it
    (the flag defaults to None so only a user-passed 0 reaches the
    override; regression for the truthiness gate that made baked widths
    impossible to turn off)."""
    from pathlib import Path

    from seld_tpu.cli import main
    from seld_tpu.config import Config
    from seld_tpu.data.synthetic import synthetic_raw_files

    wav = Path(synthetic_raw_files(tmp_path / "wavs", Config(), n_files=1,
                                   seconds=2.0, seed=5)[0][0])
    rc = main([
        "export", f"data.base_path={ckpt_dir.parent}",
        "--out", str(tmp_path / "mf.stablehlo"), "--batch-windows", "2",
        "--median-filter", "5",
    ])
    assert rc == 0
    art = SELDPredictor.from_artifact(tmp_path / "mf.stablehlo")
    assert art.median_filter == 5  # sidecar width applies by default

    # unfiltered ground truth: predict straight from the checkpoint
    rc = main([
        "predict", f"data.base_path={ckpt_dir.parent}",
        "--wavs", str(wav), "--out", str(tmp_path / "raw"),
    ])
    assert rc == 0
    rc = main([
        "predict", f"data.base_path={ckpt_dir.parent}",
        "--artifact", str(tmp_path / "mf.stablehlo"),
        "--median-filter", "0",
        "--wavs", str(wav), "--out", str(tmp_path / "override0"),
    ])
    assert rc == 0
    name = wav.stem + ".csv"
    got = (tmp_path / "override0" / "predictions" / name).read_text()
    want = (tmp_path / "raw" / "predictions" / name).read_text()
    assert got == want
