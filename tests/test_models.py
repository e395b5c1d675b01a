"""Model contract tests — the pytest upgrade of the reference's
verify_dims.py (ref verify_dims.py:10-114): every backbone maps
(B, T, C, F) -> (B, T, M, G) class-major float32 logits, trains with
mutable batch
stats, and (where the reference is importable) matches its parameter
count within tolerance."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.config import GridConfig, ModelConfig
from seld_tpu.models import build_model, init_variables

B, T, C, F, G, M = 2, 16, 4, 64, 648, 14

MODEL_TYPES = ["crnn", "conformer", "resnet_conformer", "cnn"]


def make_model(model_type, **over):
    cfg = ModelConfig(model_type=model_type, compute_dtype="float32", **over)
    return build_model(cfg, GridConfig())


def init_and_apply(model, x, train=False):
    rng = jax.random.PRNGKey(0)
    variables = init_variables(model, rng, x)
    if train:
        out, updates = jax.jit(
            lambda v, x: model.apply(
                v, x, train=True, mutable=["batch_stats"], rngs={"dropout": rng}
            )
        )(variables, x)
        return out, variables, updates
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    return out, variables, None


@pytest.mark.parametrize("model_type", MODEL_TYPES)
def test_output_contract(model_type):
    x = jnp.zeros((B, T, C, F), jnp.float32)
    model = make_model(model_type)
    out, variables, _ = init_and_apply(model, x)
    assert out.shape == (B, T, M, G)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("model_type", MODEL_TYPES)
def test_train_mode_updates_batch_stats(model_type):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, 10, C, F)), jnp.float32)
    model = make_model(model_type)
    out, variables, updates = init_and_apply(model, x, train=True)
    assert out.shape == (B, 10, M, G)
    if "batch_stats" in variables:
        # running stats must actually move for BN-bearing models
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )


def test_full_window_shape_crnn():
    # The reference contract at full window length (verify_dims.py:14-23).
    x = jnp.zeros((1, 250, C, F), jnp.float32)
    model = make_model("crnn")
    out, _, _ = init_and_apply(model, x)
    assert out.shape == (1, 250, M, G)


def test_bf16_compute_dtype():
    # Default policy: bf16 compute, f32 params, f32 logits.
    cfg = ModelConfig(model_type="conformer")  # compute_dtype bf16 default
    model = build_model(cfg, GridConfig())
    x = jnp.zeros((1, 8, C, F), jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), x)
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(p.dtype == jnp.float32 for p in leaves)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out.dtype == jnp.float32 and bool(jnp.isfinite(out).all())


def param_count(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))


REFERENCE = Path("/root/reference")


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted")
@pytest.mark.parametrize(
    "model_type,tol",
    [("crnn", 0.01), ("conformer", 0.01), ("resnet_conformer", 0.01), ("cnn", 0.01)],
)
def test_param_count_parity_with_reference(model_type, tol):
    """Parameter-count parity: the architectures must be the same size as
    the reference's (printed but never recorded there — verify_dims.py:41).
    Tolerance covers known parameterization deltas (flax GRU bias layout)."""
    sys.path.insert(0, str(REFERENCE))
    try:
        import torch  # noqa: F401
        from model import SMRSELDWithCSPDarkNet
        from model_conformer import SELD_Conformer
        from model_crnn import SELD_CRNN
        from resnet50_model import SELD_ResNet50_Conformer
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(str(REFERENCE))

    torch_models = {
        "crnn": lambda: SELD_CRNN(),
        "conformer": lambda: SELD_Conformer(),
        "resnet_conformer": lambda: SELD_ResNet50_Conformer(),
        "cnn": lambda: SMRSELDWithCSPDarkNet(use_small=True),
    }
    ref_model = torch_models[model_type]()
    ref_count = sum(p.numel() for p in ref_model.parameters())

    model = make_model(model_type)
    x = jnp.zeros((1, 4, C, F), jnp.float32)
    variables = jax.eval_shape(
        lambda r: model.init({"params": r, "dropout": r}, x, train=False),
        jax.random.PRNGKey(0),
    )
    ours = param_count(variables)

    assert ours == pytest.approx(ref_count, rel=tol), (
        f"{model_type}: ours={ours:,} ref={ref_count:,}"
    )


def test_remat_preserves_params_and_outputs():
    """model.remat wraps blocks in jax.checkpoint: the parameter tree and
    the outputs must be identical to the unwrapped model (recompute only
    changes the backward schedule), and gradients must flow through the
    wrapper."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.models import build_model, init_variables

    base = parse_overrides(
        Config(),
        [
            "model.model_type=conformer",
            "model.crnn_cnn_channels=8,16",
            "model.conf_d_model=32",
            "model.conf_n_layers=2",
            "model.compute_dtype=float32",
        ],
    )
    remat = parse_overrides(base, ["model.remat=all"])
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 4, 64)), jnp.float32
    )
    m0 = build_model(base.model, base.grid)
    m1 = build_model(remat.model, remat.grid)
    v0 = init_variables(m0, jax.random.PRNGKey(0), x)
    v1 = init_variables(m1, jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    y0 = m0.apply(v0, x, train=False)
    y1 = m1.apply(v1, x, train=False)  # same init rng -> same params
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

    # gradients flow through the remat wrapper and match the plain model
    def loss(m, v, p):
        return m.apply({**v, "params": p}, x, train=False).sum()

    g0 = jax.grad(lambda p: loss(m0, v0, p))(v0["params"])
    g1 = jax.grad(lambda p: loss(m1, v1, p))(v1["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # the flagship's resnet remat path builds with an identical param tree
    rc0 = parse_overrides(
        Config(), ["model.model_type=resnet_conformer", "model.compute_dtype=float32"]
    )
    rc1 = parse_overrides(rc0, ["model.remat=resnet"])
    mm0, mm1 = build_model(rc0.model, rc0.grid), build_model(rc1.model, rc1.grid)
    # eval_shape: abstract init, no compute — structure comparison only
    shape0 = jax.eval_shape(
        lambda r: mm0.init({"params": r, "dropout": r}, x[:1], train=False),
        jax.random.PRNGKey(0),
    )
    shape1 = jax.eval_shape(
        lambda r: mm1.init({"params": r, "dropout": r}, x[:1], train=False),
        jax.random.PRNGKey(0),
    )
    assert jax.tree_util.tree_structure(shape0) == jax.tree_util.tree_structure(shape1)
