"""Preemption-aware training-stage completion.

`train_model` RETURNS CLEANLY when a SIGTERM lands mid-run: the
PreemptionGuard checkpoints and breaks out of the epoch loop
(trainer.py — `history["preempted_epoch"]`), which is the right
behavior for `--resume`-style recovery but a trap for multi-stage study
harnesses: twice (round-3 and round-4 session handoffs, STATUS.md) a
study stamped a preemption-truncated ~2-epoch model as its trained
baseline because "train_model returned" was treated as "training
finished". This module is the single place that knows the difference.

The reference has no counterpart: its trainer (reference trainer.py:151
region) has no preemption handling at all — any interruption simply
loses the run. The hazard exists only because seld_tpu added graceful
preemption (SURVEY §5 A3), so the guard rails live here, beside it.

Use `run_training_stage` instead of hand-rolled "train then write a
done-marker" logic; use `training_completed` / `incomplete_reason` to
interrogate a history or a workdir after the fact (``evaluate_model``
stamps its report with the same check).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from seld_tpu.utils.logging import get_logger

MARKER_NAME = "train_done.json"


class IncompleteTrainingError(RuntimeError):
    """Raised when a training stage returned without completing its
    epoch budget (preemption or non-finite-loss abort)."""


def training_completed(history: dict) -> bool:
    """True iff the history describes a run that finished its epochs
    (neither SIGTERM-preempted nor aborted on a non-finite loss)."""
    return ("preempted_epoch" not in history
            and "aborted_epoch" not in history)


def incomplete_reason(history: dict) -> dict | None:
    """None for a complete run, else a small dict naming the truncation
    ({"preempted_epoch": N} or {"aborted_epoch": N})."""
    for key in ("preempted_epoch", "aborted_epoch"):
        if key in history:
            return {key: int(history[key])}
    return None


def workdir_incomplete_reason(workdir) -> dict | None:
    """Read `training_history.json` under a checkpoint workdir and
    return `incomplete_reason` of it; None when absent or complete
    (externally produced checkpoints have no history — not an error)."""
    hist_path = Path(workdir) / "training_history.json"
    if not hist_path.exists():
        return None
    try:
        history = json.loads(hist_path.read_text())
    except (OSError, json.JSONDecodeError):
        return None
    return incomplete_reason(history)


def run_training_stage(cfg, train_corpus, test_corpus, workdir, *,
                       train_fn=None, marker_extra: dict | None = None):
    """Train one study stage with a preemption-proof completion marker.

    Returns the marker dict. Reuses an existing marker (so interrupted
    multi-stage studies resume without retraining finished stages —
    markers written by the buggy pre-round-5 harnesses carry no
    "completed" stamp and are refused, forcing an explicit retrain).
    The marker is written ONLY when `training_completed(history)`;
    otherwise the stage raises `IncompleteTrainingError` so the study
    stops instead of silently consuming a truncated checkpoint — a
    rerun resumes the stage via `train_model(..., resume=True)` from
    the preemption checkpoint.
    """
    log = get_logger()
    workdir = Path(workdir)
    marker = workdir / MARKER_NAME
    if marker.exists():
        info = json.loads(marker.read_text())
        if not info.get("completed"):
            raise IncompleteTrainingError(
                f"{workdir}: stale completion marker without a "
                f"'completed' stamp ({info}) — written by a harness that "
                f"could not tell preempted from finished runs. Delete "
                f"{marker} (and the checkpoint tree, unless resuming "
                f"deliberately) and rerun."
            )
        log.info("%s: reusing trained state (%s)", workdir.name, info)
        return info

    if train_fn is None:
        from seld_tpu.train.trainer import train_model
        train_fn = train_model
    # Resume a previously preempted stage from its own checkpoints so a
    # session boundary costs only the truncated tail, not the stage.
    resume = (workdir / "rolling").exists() or (workdir / "best").exists()
    t0 = time.time()
    state, history = train_fn(
        cfg, train_corpus, test_corpus, workdir=workdir, resume=resume
    )
    reason = incomplete_reason(history)
    if reason is not None:
        raise IncompleteTrainingError(
            f"{workdir.name}: training truncated ({reason}) — no "
            f"completion marker written; rerun the study to resume this "
            f"stage from its preemption checkpoint."
        )
    from seld_tpu.train.state import param_count

    info = {
        "completed": True,
        "seconds": round(time.time() - t0),
        "params": int(param_count(state)),
        "epochs": len(history.get("train_losses", [])),
        "resumed": bool(resume),
        **(marker_extra or {}),
    }
    marker.write_text(json.dumps(info) + "\n")
    log.info("%s: trained in %ds (%s params)", workdir.name,
             info["seconds"], f"{info['params']:,}")
    return info
