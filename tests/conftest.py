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
