"""The strongest architecture-parity proof: random torch reference models
converted into seld_tpu Flax models produce the SAME outputs on the same
inputs (eval mode, running BN stats, no dropout)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.config import GridConfig, ModelConfig
from seld_tpu.models import build_model
from seld_tpu.tools.torch_import import convert_torch_state_dict

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference repo not mounted"
)


def load_reference_model(model_type):
    import torch  # noqa: F401

    sys.path.insert(0, str(REFERENCE))
    try:
        if model_type == "crnn":
            from model_crnn import SELD_CRNN

            return SELD_CRNN()
        if model_type == "conformer":
            from model_conformer import SELD_Conformer

            return SELD_Conformer()
        if model_type == "resnet_conformer":
            from resnet50_model import SELD_ResNet50_Conformer

            return SELD_ResNet50_Conformer()
        from model import SMRSELDWithCSPDarkNet

        return SMRSELDWithCSPDarkNet(use_small=True)
    finally:
        sys.path.remove(str(REFERENCE))


@pytest.mark.parametrize(
    "model_type,tol",
    [
        ("crnn", 2e-4),
        ("conformer", 2e-4),
        ("resnet_conformer", 5e-4),  # deeper: more f32 accumulation drift
        ("cnn", 5e-4),
    ],
)
def test_converted_weights_match_torch_outputs(model_type, tol):
    import torch

    torch.manual_seed(0)
    ref = load_reference_model(model_type).eval()
    # randomize BN running stats so the test cannot pass with default
    # stats; keep variances positive
    with torch.no_grad():
        for m in ref.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state_dict(sd, model_type)

    model = build_model(
        ModelConfig(model_type=model_type, compute_dtype="float32"), GridConfig()
    )
    x = np.random.default_rng(0).standard_normal((2, 6, 4, 64)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.asarray(x)
        )
    )
    # flax emits the repo's class-major (B, T, M, G); torch is (..., G, M)
    assert got.shape == (2, 6, 14, 648) and want.shape == (2, 6, 648, 14)
    np.testing.assert_allclose(
        np.swapaxes(got, -1, -2), want, atol=tol, rtol=1e-3
    )


def test_cli_import_torch_then_predict(tmp_path):
    """Full migration flow: reference-format .pth -> import-torch CLI ->
    predict serves with the imported weights."""
    import torch

    from seld_tpu.cli import main
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data.synthetic import synthetic_raw_files

    ref = load_reference_model("crnn").eval()
    pth = tmp_path / "best_model.pth"
    torch.save(
        {"model_state_dict": ref.state_dict(), "epoch": 7, "test_loss": 0.42},
        pth,
    )
    overrides = [f"data.base_path={tmp_path}", "model.model_type=crnn"]
    assert main(["import-torch", *overrides, "--torch-checkpoint", str(pth)]) == 0
    assert (tmp_path / "checkpoints" / "best").exists()

    cfg = parse_overrides(Config(), overrides)
    wavs, _ = synthetic_raw_files(tmp_path / "wav", cfg, n_files=1, seconds=1.5)
    assert main(["predict", *overrides, "--wavs", wavs[0]]) == 0


def test_import_reference_format_with_pickled_config(tmp_path, monkeypatch):
    """The reference's checkpoints embed a pickled Config instance
    (ref trainer.py:278-285); import must work without the reference
    package importable (shim unpickling)."""
    import sys as _sys

    import torch

    from seld_tpu.cli import main

    monkeypatch.chdir(tmp_path)  # reference Config() mkdirs in cwd
    _sys.path.insert(0, str(REFERENCE))
    try:
        import importlib

        import config as ref_config_mod

        importlib.reload(ref_config_mod)
        ref = load_reference_model("crnn")
        cfg_obj = ref_config_mod.Config()
        torch.save(
            {"model_state_dict": ref.state_dict(), "epoch": 5,
             "test_loss": 0.2, "config": cfg_obj},
            tmp_path / "ref_ckpt.pth",
        )
    finally:
        _sys.path.remove(str(REFERENCE))
        _sys.modules.pop("config", None)

    rc = main([
        "import-torch", f"data.base_path={tmp_path}", "model.model_type=crnn",
        "--torch-checkpoint", str(tmp_path / "ref_ckpt.pth"),
    ])
    _sys.modules.pop("config", None)  # drop the shim for later tests
    assert rc == 0
    assert (tmp_path / "checkpoints" / "best").exists()


def test_converter_rejects_wrong_architecture():
    ref = load_reference_model("crnn")
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    with pytest.raises((KeyError, ValueError)):
        convert_torch_state_dict(sd, "conformer")


def test_grid_head_permutation_respects_num_classes():
    """The class-major column permutation must split G*M by the REAL
    class count (regression: it was hardcoded to 14)."""
    import numpy as np

    from seld_tpu.tools.torch_import import _Tree, _grid_head

    hidden, g, m = 6, 4, 10  # 10 classes, 4 cells
    rng = np.random.default_rng(0)
    w = rng.standard_normal((g * m, hidden)).astype(np.float32)
    b = rng.standard_normal((g * m,)).astype(np.float32)
    sd = {
        "fnn.0.weight": rng.standard_normal((hidden, 3)).astype(np.float32),
        "fnn.0.bias": np.zeros((hidden,), np.float32),
        "fnn.1.weight": np.ones((hidden,), np.float32),
        "fnn.1.bias": np.zeros((hidden,), np.float32),
        "fnn.4.weight": w,
        "fnn.4.bias": b,
    }
    t = _Tree(sd)
    _grid_head(t, "fnn", num_classes=m)
    kernel = t.params["GridHead_0"]["logits"]["kernel"]
    bias = t.params["GridHead_0"]["logits"]["bias"]
    assert kernel.shape == (hidden, m, g)
    assert bias.shape == (m, g)
    # column (gi, mi) of the torch head == kernel[:, mi, gi]
    for gi in range(g):
        for mi in range(m):
            np.testing.assert_array_equal(
                kernel[:, mi, gi], w[gi * m + mi, :]
            )
            assert bias[mi, gi] == b[gi * m + mi]
