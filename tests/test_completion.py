"""Preemption-aware study-stage completion (seld_tpu.train.completion).

VERDICT r4 item 1a: a SIGTERM'd `train_model` returns CLEANLY after
checkpointing, and twice a study harness stamped the truncated run as
"done" (STATUS round-4 close-out). These tests pin the guard rails:
no completion marker for a preempted run, stale pre-round-5 markers are
refused, a rerun resumes and completes, and `evaluate_model` stamps
reports scored from a truncated checkpoint.

The reference has no preemption handling (reference trainer.py:151
region restarts from epoch 1), so this subsystem is seld_tpu-only.
"""

import json

import pytest

from seld_tpu.data import synthetic_corpus
from seld_tpu.train import (
    IncompleteTrainingError,
    incomplete_reason,
    run_training_stage,
    training_completed,
    workdir_incomplete_reason,
)
from tests.test_train import tiny_config


def test_history_predicates():
    assert training_completed({"train_losses": [1.0]})
    assert not training_completed({"preempted_epoch": 2})
    assert not training_completed({"aborted_epoch": 3})
    assert incomplete_reason({"train_losses": []}) is None
    assert incomplete_reason({"preempted_epoch": 2}) == {"preempted_epoch": 2}
    assert incomplete_reason({"aborted_epoch": 3}) == {"aborted_epoch": 3}


def test_workdir_reason_reads_history(tmp_path):
    assert workdir_incomplete_reason(tmp_path) is None  # no history file
    (tmp_path / "training_history.json").write_text(
        json.dumps({"train_losses": [1.0], "preempted_epoch": 1})
    )
    assert workdir_incomplete_reason(tmp_path) == {"preempted_epoch": 1}


def test_fake_preempted_train_fn_writes_no_marker(tmp_path):
    def fake_train(cfg, tr, te, workdir, resume=False):
        return None, {"train_losses": [0.5], "preempted_epoch": 1}

    with pytest.raises(IncompleteTrainingError, match="truncated"):
        run_training_stage(None, None, None, tmp_path, train_fn=fake_train)
    assert not (tmp_path / "train_done.json").exists()


def test_stale_uncommitted_marker_is_refused(tmp_path):
    # pre-round-5 harnesses wrote {"seconds":..,"params":..} markers with
    # no way to tell preempted from finished — refuse them loudly
    (tmp_path / "train_done.json").write_text(
        json.dumps({"seconds": 80, "params": 123})
    )
    with pytest.raises(IncompleteTrainingError, match="stale"):
        run_training_stage(None, None, None, tmp_path)


def test_sigterm_then_resume_end_to_end(tmp_path, monkeypatch):
    """The real hazard, end to end: stage 1 preempted (no marker), the
    rerun resumes from the preemption checkpoint, completes the epoch
    budget, and only then writes the marker; evaluate_model on the
    truncated tree carries the training_incomplete stamp."""
    from seld_tpu.train import trainer as trainer_mod

    class AlwaysPreempted(trainer_mod.PreemptionGuard):
        def __enter__(self):
            self.requested = True  # as if SIGTERM landed immediately
            return self

        def __exit__(self, *exc):
            return False

    cfg = tiny_config(tmp_path, **{"train.num_epochs": 2})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    workdir = tmp_path / "stage"

    monkeypatch.setattr(trainer_mod, "PreemptionGuard", AlwaysPreempted)
    with pytest.raises(IncompleteTrainingError, match="preempted_epoch"):
        run_training_stage(cfg, train_c, test_c, workdir)
    assert not (workdir / "train_done.json").exists()

    # scoring the truncated checkpoint is allowed but loudly stamped
    from seld_tpu.eval import evaluate_model

    m = evaluate_model(cfg, test_c, workdir, save_visualizations=False)
    assert m["training_incomplete"] == {"preempted_epoch": 1}

    monkeypatch.undo()  # real guard: the rerun resumes and completes
    info = run_training_stage(cfg, train_c, test_c, workdir)
    assert info["completed"] and info["resumed"]
    assert info["epochs"] == 1  # epoch 2 only — epoch 1 ran pre-preemption
    # reuse path: a third call returns the marker without retraining
    info2 = run_training_stage(
        cfg, train_c, test_c, workdir,
        train_fn=lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("must not retrain a completed stage")),
    )
    assert info2["completed"]
    m2 = evaluate_model(cfg, test_c, workdir, save_visualizations=False)
    assert "training_incomplete" not in m2
