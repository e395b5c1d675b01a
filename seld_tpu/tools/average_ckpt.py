"""Stochastic weight averaging over rolling checkpoints (SWA).

A serving-quality tool the reference lacks (its checkpoints are
write-only snapshots, ref trainer.py:273-308): average the weights of
the last N rolling checkpoints (Izmailov et al. 2018 — tail-averaged
SGD iterates land in flatter minima) and write the result as the BEST
checkpoint of a fresh tree, so every downstream surface (eval, predict,
export, serve) picks it up unchanged via its normal restore_best path.

What gets averaged: the `params` and `batch_stats` collections,
leaf-wise in float64 and cast back to each leaf's dtype. Batch-norm
statistics are themselves long-horizon EMAs, so averaging nearby
epochs' stats is a faithful approximation of SWA's recompute-BN step
(exact recompute would need the training corpus at averaging time).
Step counter and optimizer state are copied from the NEWEST source
checkpoint — the output is a serving artifact, but a resume from it
stays well-defined.

Usage: `seld_tpu average-ckpts --checkpoint-dir RUN --output-dir OUT
[--last N | --steps 12,14,16]`.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from seld_tpu.train.checkpoint import CheckpointManager, load_checkpoint_config
from seld_tpu.utils.logging import get_logger


def _template_state(cfg):
    import jax.numpy as jnp

    from seld_tpu.features.spatial import feature_channels
    from seld_tpu.models import build_model
    from seld_tpu.train.optimizer import make_optimizer
    from seld_tpu.train.state import create_train_state

    model = build_model(cfg.model, cfg.grid)
    win = cfg.window.window_frames(cfg.features)
    n_ch = feature_channels(cfg.features.feature_set, cfg.model.n_channels)
    sample = jnp.zeros((1, win, n_ch, cfg.model.n_mels), jnp.float32)
    optimizer = make_optimizer(cfg.train.learning_rate)
    return create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)


def _mean_trees(trees):
    """Leaf-wise f64 mean over a list of same-structure pytrees, cast
    back to each leaf's original dtype."""
    def mean_leaf(*leaves):
        acc = np.mean([np.asarray(l, np.float64) for l in leaves], axis=0)
        return acc.astype(np.asarray(leaves[0]).dtype)

    return jax.tree_util.tree_map(mean_leaf, *trees)


def average_checkpoints(checkpoint_dir, output_dir, last: int | None = None,
                        steps=None) -> dict:
    """Average rolling checkpoints into OUT/best. Returns a summary dict
    {steps, epoch, n_params}. `steps` (explicit epoch list) wins over
    `last` (newest N); default is every retained rolling checkpoint."""
    log = get_logger()
    cfg = load_checkpoint_config(checkpoint_dir)
    if cfg is None:
        raise FileNotFoundError(
            f"no checkpoint config under {checkpoint_dir}"
        )
    template = _template_state(cfg)
    src = CheckpointManager(checkpoint_dir, cfg)
    try:
        available = sorted(src._rolling.all_steps())
        if not available:
            raise FileNotFoundError(
                f"no rolling checkpoints under {checkpoint_dir} — SWA "
                "averages rolling (raw-weight) checkpoints; train with "
                "train.save_every_n_epochs to produce them"
            )
        if steps is not None:
            sel = sorted(int(s) for s in steps)
            missing = [s for s in sel if s not in available]
            if missing:
                raise ValueError(
                    f"rolling steps {missing} not found; available: "
                    f"{available}"
                )
        else:
            sel = available if last is None else available[-int(last):]
        if len(sel) < 2:
            raise ValueError(
                f"SWA needs >= 2 checkpoints; selected {sel} "
                f"(available: {available})"
            )
        restored = [src._restore(src._rolling, s, template) for s in sel]
    finally:
        src.close()

    states = [r[0] for r in restored]
    newest_state, newest_meta = restored[-1]
    avg = newest_state.replace(
        params=_mean_trees([s.params for s in states]),
        batch_stats=_mean_trees([s.batch_stats for s in states])
        if newest_state.batch_stats else newest_state.batch_stats,
    )

    out = CheckpointManager(Path(output_dir), cfg)
    try:
        meta = out._meta(
            newest_meta["epoch"], newest_meta["train_loss"],
            newest_meta["test_loss"],
        )
        meta["swa_sources"] = sel
        out._save(out._best, newest_meta["epoch"], avg, meta)
        out.wait()
    finally:
        out.close()
    from seld_tpu.train.state import param_count

    log.info("SWA: averaged rolling steps %s -> %s/best (epoch %d)",
             sel, output_dir, newest_meta["epoch"])
    return {
        "steps": sel,
        "epoch": int(newest_meta["epoch"]),
        "n_params": param_count(avg),
    }
