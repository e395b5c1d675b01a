"""Checkpoint layout migration: class-minor -> class-major GridHead.

Round 3 switched the grid models' logits layout from the reference's
class-minor (B, T, G, M) (ref model_crnn.py:77-83 reshapes its G*M-wide
FC to (..., G, M)) to the TPU-friendly class-major (B, T, M, G): the
loss/softmax reductions run over M with the G=648 cells on the lane
axis, and the fused Pallas loss kernel consumes the head output without
the two ~145 MB transposes the old layout paid per step.

That switch changes the GridHead's final layer from a Dense(G*M) kernel
(hidden, G*M) — columns ordered grid-major, g*M + m — to a DenseGeneral
kernel (hidden, M, G). Checkpoints written before the switch therefore
no longer restore. This tool upgrades them in place-preserving fashion:
a pure column permutation on the final kernel/bias (and every optimizer
moment mirroring them), after which the migrated model's outputs satisfy
new[..., m, g] == old[..., g, m] bit-for-bit.

CSPDarkNet checkpoints need no migration (its per-cell classifier params
are layout-independent; the class-major output is a pure transpose), and
ACCDOA checkpoints are untouched by the switch — both pass through
unchanged (the walk simply finds no GridHead leaves).

Usage: `seld_tpu migrate-ckpt --checkpoint-dir OLD --output-dir NEW`.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import orbax.checkpoint as ocp

from seld_tpu.utils.logging import get_logger


def _migrate_tree(tree, num_classes: int, in_grid_head: bool = False):
    """Recursively permute every GridHead_0/.../logits/{kernel,bias} leaf
    from the class-minor (hidden, G*M) layout to class-major
    (hidden, M, G). Mirrors of the params tree (optimizer mu/nu, EMA)
    are covered by the same walk. Returns (migrated_tree, n_changed)."""
    n = 0
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            sub_in_head = in_grid_head or k == "GridHead_0"
            if in_grid_head and k == "logits" and isinstance(v, dict):
                leaf = dict(v)
                kern = leaf.get("kernel")
                if kern is not None and np.ndim(kern) == 2:
                    hidden, gm = kern.shape
                    if gm % num_classes:
                        raise ValueError(
                            f"GridHead logits kernel width {gm} is not a "
                            f"multiple of num_classes={num_classes}"
                        )
                    g = gm // num_classes
                    leaf["kernel"] = np.ascontiguousarray(
                        np.asarray(kern)
                        .reshape(hidden, g, num_classes)
                        .transpose(0, 2, 1)
                    )
                    n += 1
                bias = leaf.get("bias")
                if bias is not None and np.ndim(bias) == 1:
                    g = bias.shape[0] // num_classes
                    leaf["bias"] = np.ascontiguousarray(
                        np.asarray(bias).reshape(g, num_classes).T
                    )
                    n += 1
                out[k] = leaf
            else:
                out[k], dn = _migrate_tree(v, num_classes, sub_in_head)
                n += dn
        return out, n
    if isinstance(tree, (list, tuple)):
        items = [_migrate_tree(v, num_classes, in_grid_head) for v in tree]
        return type(tree)(v for v, _ in items), sum(dn for _, dn in items)
    return tree, 0


def migrate_checkpoint_tree(src_dir, dst_dir) -> dict:
    """Upgrade every best/rolling checkpoint under `src_dir` to the
    class-major GridHead layout, writing the migrated tree (same steps,
    same metadata, same config) under `dst_dir`.

    Already-migrated checkpoints (3-D logits kernel) pass through
    unchanged, so the tool is idempotent. Returns a summary dict:
    {"best": [(step, n_leaves_changed)], "rolling": [...]}.
    """
    src_dir, dst_dir = Path(src_dir).absolute(), Path(dst_dir).absolute()
    if src_dir == dst_dir:
        raise ValueError("output-dir must differ from checkpoint-dir")
    log = get_logger()
    summary: dict = {}
    found_any = False
    for sub in ("best", "rolling"):
        summary[sub] = []
        if not (src_dir / sub).exists():
            continue
        src = ocp.CheckpointManager(src_dir / sub)
        dst = None
        try:
            steps = src.all_steps()
            if steps:
                found_any = True
                dst = ocp.CheckpointManager(
                    dst_dir / sub,
                    options=ocp.CheckpointManagerOptions(
                        max_to_keep=max(len(steps), 1)
                    ),
                )
            for step in sorted(steps):
                restored = src.restore(
                    step,
                    args=ocp.args.Composite(
                        state=ocp.args.StandardRestore(),
                        meta=ocp.args.JsonRestore(),
                    ),
                )
                meta = restored["meta"]
                num_classes = int(
                    meta.get("config", {})
                    .get("grid", {})
                    .get("num_classes", 14)
                )
                state, n = _migrate_tree(restored["state"], num_classes)
                dst.save(
                    step,
                    args=ocp.args.Composite(
                        state=ocp.args.StandardSave(state),
                        meta=ocp.args.JsonSave(meta),
                    ),
                )
                log.info(
                    "migrate-ckpt: %s step %d — %d head leaves permuted%s",
                    sub, step, n,
                    "" if n else " (already class-major or no GridHead)",
                )
                summary[sub].append((step, n))
            if dst is not None:
                dst.wait_until_finished()
        finally:
            src.close()
            if dst is not None:
                dst.close()
    if not found_any:
        raise FileNotFoundError(f"no checkpoints under {src_dir}")
    return summary
