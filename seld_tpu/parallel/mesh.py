"""Device mesh construction.

The reference is strictly single-GPU (SURVEY §2 parallelism checklist:
no torch.distributed/NCCL anywhere; run_job.slurm:6 pins one GPU). The
TPU-native scaling story is a 2-D jax.sharding.Mesh:

  * axis "data"  — batch (data parallel). Gradients of replicated params
    all-reduce over ICI; XLA inserts the psum from the shardings.
  * axis "model" — tensor parallel for the wide layers (grid-head logits
    projection G*M = 9072 wide, conformer FFN/attention projections).

Defaults put all devices on "data" (the BASELINE.json config-5 workload:
batched data-parallel across a v5e-8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    """Create a (data, model) mesh. n_data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data == -1:
        assert n % n_model == 0, (n, n_model)
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
