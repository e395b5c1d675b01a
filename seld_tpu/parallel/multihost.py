"""Multi-host (DCN) support: process init, per-host data sharding.

The reference is strictly single-node (SURVEY §2: no torch.distributed
anywhere; run_job.slurm:6 pins one GPU). The TPU-native scale-out story
past one host is JAX multi-process SPMD: every host runs this same
program, `jax.distributed.initialize` wires the processes together, the
(data, model) mesh spans all chips (ICI within a host/slice, DCN across),
and each host feeds ONLY its local shard of the global batch via
`jax.make_array_from_process_local_data`. Model code, sharding rules, and
the jitted train step are unchanged — GSPMD sees one global program.

Single-process (including the 8-virtual-device CPU test mesh) is the
degenerate case of every function here, which is how this module is
tested without real multi-host hardware.
"""

from __future__ import annotations

import jax
import numpy as np

from seld_tpu.parallel.sharding import batch_sharding
from seld_tpu.utils.logging import get_logger


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize JAX multi-process runtime; returns True if distributed.

    With no arguments, relies on JAX's cloud auto-detection (TPU pod
    metadata provides coordinator/process topology on Cloud TPU VMs).
    No-op (returns False) when the process count resolves to 1 or when
    the runtime is already initialized.
    """
    if num_processes == 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # Already initialized (idempotent use from notebooks/retries).
        if "already" in str(e).lower():
            return jax.process_count() > 1
        raise
    n = jax.process_count()
    get_logger().info(
        "multihost: process %d/%d, %d local of %d global devices",
        jax.process_index(), n, jax.local_device_count(), jax.device_count(),
    )
    return n > 1


def process_local_indices(n_items: int, process_id: int | None = None,
                          num_processes: int | None = None) -> np.ndarray:
    """The contiguous slice of [0, n_items) this process is responsible
    for loading (corpus files, eval windows). Remainders go to the lowest
    process ids, so every index is covered exactly once and slice sizes
    differ by at most 1."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    base, rem = divmod(n_items, n)
    start = pid * base + min(pid, rem)
    stop = start + base + (1 if pid < rem else 0)
    return np.arange(start, stop)


def local_batch_size(global_batch: int) -> int:
    """Rows of the global batch this process must supply.

    Assumes the supported layout: the data axis spans processes evenly
    (each host contributes the same number of batch rows) — the layout
    `make_mesh` produces when devices enumerate host-major. A model-only
    axis across hosts is not supported by the batch pipeline."""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (
        f"global batch {global_batch} not divisible by {n_proc} processes"
    )
    return global_batch // n_proc


def global_batch_array(mesh, local_rows: np.ndarray,
                       time_sharded: bool = False) -> jax.Array:
    """Assemble the global, data-axis-sharded batch array from this
    process's local rows.

    Single-process this is exactly `jax.device_put(local_rows,
    batch_sharding(mesh, ndim))`; multi-process each host passes its
    `local_batch_size` rows and JAX stitches the global array without any
    cross-host transfer (each device keeps the shard its own host fed).
    """
    sharding = batch_sharding(mesh, local_rows.ndim)
    if time_sharded and local_rows.ndim >= 2:
        from seld_tpu.parallel.sharding import time_batch_sharding

        sharding = time_batch_sharding(mesh, local_rows.ndim)
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_rows)
    )


def device_batch(mesh, *arrays: np.ndarray,
                 time_sharded: bool = False) -> tuple[jax.Array, ...]:
    """`global_batch_array` over several same-leading-dim arrays.
    `time_sharded` additionally shards axis 1 (time) of every ndim>=2
    array over the model mesh axis (sequence parallelism)."""
    return tuple(
        global_batch_array(mesh, a, time_sharded=time_sharded)
        for a in arrays
    )
