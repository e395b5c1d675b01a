"""Checkpoint averaging / SWA (seld_tpu/tools/average_ckpt.py).

Contracts: the output equals the exact leaf-wise mean of the selected
rolling checkpoints' params and batch_stats (f64 accumulation, original
dtype out); selection semantics (--last / --steps / errors); downstream
surfaces restore the averaged weights through their normal best-ckpt
path.
"""

import numpy as np
import pytest

from seld_tpu.config import Config
from seld_tpu.data import synthetic_corpus
from seld_tpu.infer import SELDPredictor
from seld_tpu.tools.average_ckpt import average_checkpoints
from seld_tpu.train import train_model
from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    """A 3-epoch tiny run with a rolling checkpoint every epoch."""
    tmp = tmp_path_factory.mktemp("swa")
    cfg = tiny_config(tmp, **{"train.num_epochs": 3})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp / "ckpt")
    return tmp, cfg


def _leaves(state_tree):
    import jax

    return jax.tree_util.tree_leaves(state_tree)


def _restore_raw(ckpt_dir, cfg, which, step=None):
    from seld_tpu.tools.average_ckpt import _template_state
    from seld_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_dir, cfg)
    try:
        sub = mgr._best if which == "best" else mgr._rolling
        return mgr._restore(sub, step, _template_state(cfg))
    finally:
        mgr.close()


def test_average_is_exact_mean(run):
    tmp, cfg = run
    out = tmp / "swa_out"
    summary = average_checkpoints(tmp / "ckpt", out, last=2)
    assert len(summary["steps"]) == 2

    srcs = [
        _restore_raw(tmp / "ckpt", cfg, "rolling", s)[0]
        for s in summary["steps"]
    ]
    avg_state, meta = _restore_raw(out, cfg, "best")
    assert meta["swa_sources"] == summary["steps"]
    for got, *leaves in zip(
        _leaves(avg_state.params), *[_leaves(s.params) for s in srcs]
    ):
        want = np.mean([np.asarray(l, np.float64) for l in leaves], axis=0
                       ).astype(np.asarray(leaves[0]).dtype)
        np.testing.assert_array_equal(np.asarray(got), want)
    # batch_stats averaged too (crnn has BN)
    for got, *leaves in zip(
        _leaves(avg_state.batch_stats),
        *[_leaves(s.batch_stats) for s in srcs],
    ):
        want = np.mean([np.asarray(l, np.float64) for l in leaves], axis=0
                       ).astype(np.asarray(leaves[0]).dtype)
        np.testing.assert_array_equal(np.asarray(got), want)
    # averaged weights genuinely differ from the newest source
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(_leaves(avg_state.params), _leaves(srcs[-1].params))
    ]
    assert max(diffs) > 0


def test_selection_and_errors(run):
    tmp, cfg = run
    # explicit steps
    s = average_checkpoints(tmp / "ckpt", tmp / "o2", steps=[1, 3])
    assert s["steps"] == [1, 3]
    with pytest.raises(ValueError, match="not found"):
        average_checkpoints(tmp / "ckpt", tmp / "o3", steps=[1, 99])
    with pytest.raises(ValueError, match=">= 2"):
        average_checkpoints(tmp / "ckpt", tmp / "o4", last=1)
    with pytest.raises(FileNotFoundError, match="no checkpoint config"):
        average_checkpoints(tmp / "nowhere", tmp / "o5")


def test_downstream_surfaces_load_the_average(run, tmp_path):
    tmp, cfg = run
    out = tmp / "swa_serving"
    average_checkpoints(tmp / "ckpt", out)
    # predictor restores it through restore_best
    pred = SELDPredictor(out, batch_windows=2)
    from seld_tpu.data.synthetic import synthetic_raw_files

    wavs, _ = synthetic_raw_files(tmp_path / "wav", cfg, n_files=1,
                                  seconds=2.0)
    p = pred.predict_file(wavs[0])
    assert p.classes.shape[1] == cfg.grid.n_cells


def test_cli_average_ckpts(run, tmp_path):
    tmp, cfg = run
    from seld_tpu.cli import main

    rc = main([
        "average-ckpts", "--checkpoint-dir", str(tmp / "ckpt"),
        "--output-dir", str(tmp_path / "cli_out"), "--last", "2",
    ])
    assert rc == 0
    assert (tmp_path / "cli_out" / "best").is_dir()
