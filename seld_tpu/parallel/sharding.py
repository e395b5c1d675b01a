"""Partition rules: parameter path -> PartitionSpec.

t5x-style declarative rules. Megatron-pattern tensor parallelism for the
transformer-ish layers:

  * attention q/k/v kernels: shard the head (output) dim   -> P(None, "model")
  * attention output kernel: shard the input dim           -> P("model", None)
  * FFN up-projection / GLU pointwise: shard output dim    -> P(None, "model")
  * FFN down-projection: shard input dim                   -> P("model", None)
  * grid-head logits kernel (-> G*M = 9072 wide): shard output dim
  * everything else (convs, norms, GRU cells): replicated

Column-then-row sharded pairs need no collective between them; XLA inserts
one reduce-scatter/all-reduce per pair over ICI.
"""

from __future__ import annotations

import re

import jax
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


def _tree_paths_specs(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    specs = []
    for key_path, leaf in flat:
        path = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in key_path
        )
        specs.append(param_partition_spec(path, getattr(leaf, "ndim", 0)))
    return treedef, specs


def shard_variables(tree, mesh):
    """Place a variables/params pytree onto the mesh per the rules."""
    treedef, specs = _tree_paths_specs(tree)
    leaves = treedef.flatten_up_to(tree)
    placed = [
        jax.device_put(leaf, NamedSharding(mesh, spec))
        for leaf, spec in zip(leaves, specs)
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def state_shardings(tree, mesh):
    """NamedSharding pytree mirroring `tree` (for jit in/out_shardings)."""
    treedef, specs = _tree_paths_specs(tree)
    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, s) for s in specs]
    )


def batch_sharding(mesh, ndim: int) -> NamedSharding:
    """Batch arrays: leading dim over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
