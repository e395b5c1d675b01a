"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the 'axon' TPU backend at
interpreter startup (before conftest runs), so JAX_PLATFORMS env vars are
too late — we must override via jax.config. XLA_FLAGS still applies
because the CPU backend initializes lazily on first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat test runs skip recompiles.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"


TINY_CRNN_OVERRIDES = [
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


def train_tiny_checkpoint(base_path, extra_overrides=()):
    """Train the standard tiny crnn checkpoint into <base_path>/checkpoints;
    returns (cfg, checkpoint_dir). Shared by the serving-surface test
    modules so each distinct config trains exactly once per suite run."""
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.train import train_model

    cfg = parse_overrides(
        Config(),
        TINY_CRNN_OVERRIDES + [f"data.base_path={base_path}", *extra_overrides],
    )
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=base_path / "checkpoints")
    return cfg, base_path / "checkpoints"


@pytest.fixture(scope="session")
def tiny_crnn_ckpt(tmp_path_factory):
    """Session-shared tiny crnn checkpoint (mel features)."""
    base = tmp_path_factory.mktemp("tiny_crnn")
    _, ckpt = train_tiny_checkpoint(base)
    return ckpt
