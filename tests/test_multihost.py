"""Multi-host helpers (seld_tpu/parallel/multihost.py).

Real DCN hardware is unavailable; these tests pin the single-process
degenerate case on the 8-virtual-device mesh (which multi-host reduces to
per-process) and the pure index/partition arithmetic for every process
count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.parallel import (
    batch_sharding,
    global_batch_array,
    local_batch_size,
    make_mesh,
    process_local_indices,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=4, n_model=2)


def test_global_batch_array_matches_device_put(mesh):
    x = np.random.default_rng(0).standard_normal((8, 6, 4)).astype(np.float32)
    got = global_batch_array(mesh, x)
    ref = jax.device_put(x, batch_sharding(mesh, 3))
    assert got.sharding == ref.sharding
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_global_batch_array_feeds_sharded_compute(mesh):
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    arr = global_batch_array(mesh, x)
    total = float(jnp.sum(arr * 2.0))
    assert total == pytest.approx(2.0 * x.sum())


@pytest.mark.parametrize("n_proc", [1, 2, 3, 4, 7, 8])
@pytest.mark.parametrize("n_items", [0, 1, 8, 23, 64])
def test_process_local_indices_partition(n_proc, n_items):
    chunks = [
        process_local_indices(n_items, process_id=p, num_processes=n_proc)
        for p in range(n_proc)
    ]
    merged = np.concatenate(chunks) if chunks else np.array([])
    np.testing.assert_array_equal(merged, np.arange(n_items))
    sizes = [len(c) for c in chunks]
    assert max(sizes) - min(sizes) <= 1  # balanced


def test_process_local_indices_default_process(monkeypatch):
    # Defaults read jax.process_index/count — single process covers all.
    np.testing.assert_array_equal(process_local_indices(5), np.arange(5))


def test_local_batch_size_single_process():
    assert local_batch_size(16) == 16


def test_local_batch_size_divisibility(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert local_batch_size(16) == 4
    with pytest.raises(AssertionError):
        local_batch_size(6)


def test_initialize_multihost_noop_for_single_process():
    from seld_tpu.parallel import initialize_multihost

    assert initialize_multihost(num_processes=1) is False
