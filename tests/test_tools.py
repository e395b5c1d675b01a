"""Tool tests: augmentation comparison (notebook C24 parity) and the
gaussian-monolith-mode full pipeline."""

import numpy as np

from seld_tpu.config import Config, parse_overrides
from seld_tpu.data import synthetic_corpus
from seld_tpu.tools.augment_compare import compare_augmentation


def test_compare_augmentation(tmp_path):
    rows = np.array(
        [[0, 3, 0, 10, 20], [1, 3, 0, 12, 22], [2, 7, 1, -170, -50]], np.int64
    )
    meta = tmp_path / "m.csv"
    np.savetxt(meta, rows, fmt="%d", delimiter=",")
    stats = compare_augmentation(meta, total_frames=20, save_dir=tmp_path)
    assert stats["gaussian_active_cells"] >= stats["point_active_cells"]
    assert stats["inflation_ratio"] >= 1.0
    assert stats["frames_with_events"] == 15  # 3 metadata frames x fanout 5
    import os

    assert os.path.exists(stats["figure"])


def test_profile_summary_tool(tmp_path):
    import jax
    import jax.numpy as jnp

    from seld_tpu.tools.profile_summary import summarize

    trace_dir = tmp_path / "trace"
    jax.profiler.start_trace(str(trace_dir))
    x = jnp.ones((256, 256))
    for _ in range(3):
        x = (x @ x) * 1e-3
    float(x.sum())
    jax.profiler.stop_trace()

    rows, plane = summarize(trace_dir, top=10)
    assert len(rows) > 0
    assert all(ms >= 0 for ms, _, _ in rows)


def test_gaussian_monolith_mode_pipeline(tmp_path):
    """The reference's gaussian-monolith configuration end to end:
    CSPDarkNet + Gaussian-region train targets + full 3-term loss
    (ref smrl_seld_gaussian.py:2080-2127, 1059-1070)."""
    from seld_tpu.train import train_model

    cfg = parse_overrides(
        Config(),
        [
            "model.model_type=cnn",
            "model.compute_dtype=float32",
            "targets.use_gaussian_augmentation=true",
            "loss.use_aiur=true",
            "loss.use_cl=true",
            "window.window_seconds=0.5",
            "window.hop_seconds=0.5",
            "train.batch_size=2",
            "train.num_epochs=1",
            f"data.base_path={tmp_path}",
        ],
    )
    train_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=0, train=True)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1, train=False)
    state, history = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert np.isfinite(history["train_losses"][0])


def test_replot_from_metrics_jsonl(tmp_path, capsys):
    """Regenerating artifacts from metrics.jsonl: table + PNG."""
    import json

    from seld_tpu.tools.replot import main as replot_main

    records = [
        {"epoch": e, "seconds": 1.2, "lr": 1e-3,
         "train": {"loss": 1.0 / e, "class_mse": 0.5 / e},
         "test": {"loss": 1.1 / e, "class_mse": 0.6 / e}}
        for e in range(1, 6)
    ]
    mfile = tmp_path / "metrics.jsonl"
    mfile.write_text("\n".join(json.dumps(r) for r in records))
    out = tmp_path / "curves.png"
    rc = replot_main([str(mfile), "--out", str(out)])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 1000
    printed = capsys.readouterr().out
    assert "best test 0.220000 @ epoch 5" in printed
    assert "class_mse" in printed and printed.count("\n") >= 6
