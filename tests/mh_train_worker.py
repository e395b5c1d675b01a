"""Multi-host worker (NOT a test module — spawned by test_multihost_e2e).

Runs one sharded flagship-semantics train step as process `pid` of
`nproc`, each process contributing its local batch rows, and prints the
resulting loss. With nproc=1 it is the single-process oracle.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from seld_tpu.config import Config, parse_overrides  # noqa: E402
from seld_tpu.losses import SELDLossFn  # noqa: E402
from seld_tpu.models import build_model  # noqa: E402
from seld_tpu.parallel import (  # noqa: E402
    global_batch_array,
    initialize_multihost,
    make_mesh,
    process_local_indices,
    shard_variables,
    state_shardings,
)
from seld_tpu.train import (  # noqa: E402
    create_train_state,
    make_optimizer,
    make_train_step,
)

if nproc > 1:
    initialize_multihost(f"localhost:{port}", nproc, pid)
mesh = make_mesh(n_data=jax.device_count(), n_model=1)

cfg = parse_overrides(Config(), [
    "model.model_type=crnn", "model.crnn_cnn_channels=4,8",
    "model.crnn_rnn_hidden=8", "model.crnn_rnn_layers=1",
    "model.compute_dtype=float32",
])
model = build_model(cfg.model, cfg.grid)
loss_fn = SELDLossFn(cfg.loss, cfg.grid)
opt = make_optimizer(1e-3)

B, T = 8, 16
rng_np = np.random.default_rng(0)
mel_full = rng_np.standard_normal((B, T, 4, 64)).astype(np.float32)
mask_full = np.zeros((B, T, 648), np.int32)
mask_full[:, :, 100] = 8
em_full = np.ones((B,), np.float32)

state = create_train_state(
    model, opt, jax.random.PRNGKey(0), jnp.asarray(mel_full[:2])
)
state = shard_variables(state, mesh)
shardings = state_shardings(state, mesh)
step = make_train_step(
    model, loss_fn, opt, 14, donate=False, out_state_shardings=shardings
)

# Route through the trainer's own batch placement (every process holds
# the same full batch; _device_batch must slice per process so the global
# array has NO duplicated rows).
from types import SimpleNamespace  # noqa: E402

from seld_tpu.train.trainer import _device_batch  # noqa: E402

batch = SimpleNamespace(mel=mel_full, label_mask=mask_full, accdoa=None,
                        n_valid=B)
mel, mask, em = _device_batch(batch, mesh)
assert mel.shape[0] == B, f"global batch {mel.shape[0]} != {B} (duplication?)"
import jax.numpy as _jnp  # noqa: E402

assert float(_jnp.sum(em)) == float(B), "example mask duplicated across hosts"
new_state, metrics = step(state, mel, mask, em, jax.random.PRNGKey(1))
print(f"[{pid}] TRAIN_LOSS {float(metrics['loss']):.8f}", flush=True)

# keep the low-level helpers covered too
idx = process_local_indices(B)
alt = global_batch_array(mesh, mel_full[idx])
assert alt.shape == mel.shape
