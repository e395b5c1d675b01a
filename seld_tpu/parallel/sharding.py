"""Partition rules: parameter path -> PartitionSpec.

t5x-style declarative rules. Megatron-pattern tensor parallelism for the
transformer-ish layers:

  * attention q/k/v kernels: shard the head (output) dim   -> P(None, "model")
  * attention output kernel: shard the input dim           -> P("model", None)
  * FFN up-projection / GLU pointwise: shard output dim    -> P(None, "model")
  * FFN down-projection: shard input dim                   -> P("model", None)
  * grid-head logits DenseGeneral kernel (hidden, M, G): shard the G
    (grid-cell) axis — the class-major output (B, T, M, G) lands
    sharded over cells, so the loss softmax over M stays shard-local
  * everything else (convs, norms, GRU cells): replicated

Column-then-row sharded pairs need no collective between them; XLA inserts
one reduce-scatter/all-reduce per pair over ICI.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from seld_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (regex over 'a/b/c' param path, spec builder taking the leaf ndim)
_COL = lambda ndim: P(*([None] * (ndim - 1) + [MODEL_AXIS]))  # shard last dim
_ROW = lambda ndim: P(*([MODEL_AXIS] + [None] * (ndim - 1)))  # shard first dim
_REP = lambda ndim: P()

_RULES = [
    (re.compile(r".*/w_[qkv]/kernel$"), _COL),
    (re.compile(r".*/w_[qkv]/bias$"), _COL),
    (re.compile(r".*/w_o/kernel$"), _ROW),
    (re.compile(r".*FeedForward_\d+/Dense_0/kernel$"), _COL),
    (re.compile(r".*FeedForward_\d+/Dense_0/bias$"), _COL),
    (re.compile(r".*FeedForward_\d+/Dense_1/kernel$"), _ROW),
    (re.compile(r".*GridHead_\d+/logits/kernel$"), _COL),
    (re.compile(r".*GridHead_\d+/logits/bias$"), _COL),
]


def param_partition_spec(path: str, ndim: int) -> P:
    for pattern, builder in _RULES:
        if pattern.match(path):
            return builder(ndim)
    return _REP(ndim)


def _zero_spec(shape, n_data: int) -> P:
    """ZeRO-style spec: shard the first dim divisible by the data-axis
    size; fully replicated when none divides."""
    for axis, s in enumerate(shape):
        if s >= n_data and s % n_data == 0:
            return P(*(DATA_AXIS if i == axis else None for i in range(len(shape))))
    return P()


def path_of(key_path) -> str:
    """Render a tree_flatten_with_path key path as 'a/b/c'."""
    return "/".join(
        str(getattr(k, "key", getattr(k, "name", k))) for k in key_path
    )


# FSDP shards only leaves at least this large: gathering a tiny norm
# scale costs a collective launch for no memory win (standard FSDP
# practice: small leaves stay replicated).
FSDP_MIN_LEAF_ELEMENTS = 2**15


def _tree_paths_specs(tree, n_data_zero: int = 0, n_data_fsdp: int = 0,
                      use_tp_rules: bool = True):
    """(treedef, specs). With n_data_zero > 0, optimizer-moment leaves
    (paths containing /mu/ or /nu/) that the TP rules leave replicated are
    sharded over the data axis instead (ZeRO-1 for Adam state: saves 2/3
    of optimizer memory per chip; XLA inserts the all-gather when moments
    meet replicated params in the update).

    With n_data_fsdp > 0 (ZeRO-3 / FSDP), EVERY large leaf the TP rules
    leave replicated — parameters included, not just moments — is
    sharded over the data axis: GSPMD all-gathers each parameter just
    before its use in the forward/backward and reduce-scatters its
    gradient, so full-state memory scales ~1/n_data. Leaves smaller than
    FSDP_MIN_LEAF_ELEMENTS (norm scales, biases, BN statistics) stay
    replicated — a collective per tiny leaf costs more than it saves."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    specs = []
    for key_path, leaf in flat:
        path = path_of(key_path)
        ndim = getattr(leaf, "ndim", 0)
        # use_tp_rules=False (sequence parallelism: the model axis
        # carries TIME, not weight shards) leaves params replicated
        # except for the ZeRO/FSDP data-axis sharding below
        spec = param_partition_spec(path, ndim) if use_tp_rules else P()
        if spec == P() and ndim >= 1:
            is_moment = "/mu/" in path or "/nu/" in path
            size = int(np.prod(leaf.shape))
            if n_data_fsdp > 1 and size >= FSDP_MIN_LEAF_ELEMENTS:
                spec = _zero_spec(leaf.shape, n_data_fsdp)
            elif n_data_zero > 1 and is_moment:
                spec = _zero_spec(leaf.shape, n_data_zero)
        specs.append(spec)
    return treedef, specs


def _validate_specs(tree, mesh, treedef, specs) -> None:
    """Fail fast with a named error when a partition rule would shard a
    dimension that the mesh axis size does not divide (e.g. n_model=3 on
    a 32-wide projection). GSPMD would otherwise silently pad/reshard —
    a correctness-preserving perf surprise that is much harder to
    diagnose than this error (VERDICT r2 #8)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    problems = []
    for (key_path, leaf), spec in zip(flat, specs):
        shape = getattr(leaf, "shape", ())
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            n = mesh.shape[axis]
            if n > 1 and shape[dim] % n != 0:
                problems.append(
                    f"  {path_of(key_path)}: shape {tuple(shape)} dim {dim} "
                    f"({shape[dim]}) not divisible by mesh axis "
                    f"'{axis}'={n}"
                )
    if problems:
        raise ValueError(
            "Mesh/model shape mismatch — these parameters cannot be evenly "
            "sharded (pick a model-axis size that divides the layer widths, "
            "e.g. d_model, n_heads*head_dim, d_ff, and the grid-head "
            "fan-out):\n" + "\n".join(problems)
        )


def shard_variables(tree, mesh, zero_opt_state: bool = False,
                    shard_params: bool = False, use_tp_rules: bool = True):
    """Place a variables/params/state pytree onto the mesh per the rules.
    `shard_params` enables ZeRO-3/FSDP sharding of large replicated
    leaves over the data axis (see _tree_paths_specs);
    `use_tp_rules=False` disables the tensor-parallel weight rules
    (sequence parallelism repurposes the model axis for time)."""
    n = mesh.shape[DATA_AXIS]
    treedef, specs = _tree_paths_specs(
        tree, n if zero_opt_state else 0, n if shard_params else 0,
        use_tp_rules,
    )
    _validate_specs(tree, mesh, treedef, specs)
    leaves = treedef.flatten_up_to(tree)
    placed = [
        jax.device_put(leaf, NamedSharding(mesh, spec))
        for leaf, spec in zip(leaves, specs)
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def state_shardings(tree, mesh, zero_opt_state: bool = False,
                    shard_params: bool = False, use_tp_rules: bool = True):
    """NamedSharding pytree mirroring `tree` (for jit in/out_shardings)."""
    n = mesh.shape[DATA_AXIS]
    treedef, specs = _tree_paths_specs(
        tree, n if zero_opt_state else 0, n if shard_params else 0,
        use_tp_rules,
    )
    _validate_specs(tree, mesh, treedef, specs)
    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, s) for s in specs]
    )


def batch_sharding(mesh, ndim: int) -> NamedSharding:
    """Batch arrays: leading dim over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def time_batch_sharding(mesh, ndim: int) -> NamedSharding:
    """Sequence parallelism: (B, T, ...) batches shard batch over the
    data axis AND time over the model axis. GSPMD partitions the whole
    network over time from this one annotation — convs get halo
    exchanges, attention einsums get their collectives, reductions
    all-reduce (the scaling-book recipe: annotate, let XLA insert
    collectives). Mutually exclusive with tensor parallelism: the model
    axis carries time, so the TP weight rules must be disabled
    (shard_variables(use_tp_rules=False))."""
    assert ndim >= 2, "time sharding needs a (B, T, ...) array"
    return NamedSharding(
        mesh, P(DATA_AXIS, MODEL_AXIS, *([None] * (ndim - 2)))
    )
