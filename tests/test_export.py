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
