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

    from seld_tpu.tools.profile_summary import category_totals

    cats = category_totals(trace_dir)
    assert cats and all(v >= 0 for v in cats.values())
    # a matmul loop must show real compute time in some bucket
    assert sum(v for k, v in cats.items() if k != "enclosing_ms") > 0


def test_category_totals_on_committed_tpu_trace():
    """The roofline accounting's category split, against a real TPU
    trace (the round-3 inference_b64 VMEM-regression capture): async
    -start spans overlap compute and must be separated from the -done
    stalls, and the non-async leaf categories must roughly partition
    the enclosing jit time."""
    from pathlib import Path

    from seld_tpu.tools.profile_summary import category_totals

    trace_dir = Path(__file__).parent.parent / "benchmarks/results/traces"
    cats = category_totals(trace_dir)
    assert cats["async_issue_ms"] > cats["enclosing_ms"], cats  # overlap
    leaf = sum(v for k, v in cats.items()
               if k not in ("enclosing_ms", "async_issue_ms"))
    assert 0.5 * cats["enclosing_ms"] < leaf < 1.5 * cats["enclosing_ms"], \
        cats


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


def test_migrate_ckpt_roundtrip(tiny_crnn_ckpt, tmp_path):
    """`seld_tpu migrate-ckpt` upgrades a pre-round-3 class-minor
    checkpoint to the class-major GridHead layout with bit-identical
    model outputs. Simulated by inverse-permuting a fresh checkpoint's
    head leaves into the legacy (hidden, G*M) Dense layout (the exact
    on-disk format the old code wrote), migrating it back, and comparing
    predictor outputs bitwise. Also pins idempotence: migrating an
    already-class-major tree permutes nothing."""
    import orbax.checkpoint as ocp

    from seld_tpu.infer import SELDPredictor
    from seld_tpu.tools.migrate_ckpt import migrate_checkpoint_tree

    def downgrade(tree, in_head=False):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if in_head and k == "logits" and isinstance(v, dict):
                    leaf = dict(v)
                    kern = np.asarray(leaf["kernel"])  # (hidden, M, G)
                    h, m, g = kern.shape
                    leaf["kernel"] = np.ascontiguousarray(
                        kern.transpose(0, 2, 1).reshape(h, g * m)
                    )
                    bias = np.asarray(leaf["bias"])  # (M, G)
                    leaf["bias"] = np.ascontiguousarray(bias.T.reshape(-1))
                    out[k] = leaf
                else:
                    out[k] = downgrade(v, in_head or k == "GridHead_0")
            return out
        if isinstance(tree, (list, tuple)):
            return type(tree)(downgrade(v, in_head) for v in tree)
        return tree

    legacy = tmp_path / "legacy"
    for sub in ("best", "rolling"):
        src = ocp.CheckpointManager(tiny_crnn_ckpt.absolute() / sub)
        dst = ocp.CheckpointManager(legacy / sub)
        try:
            for step in src.all_steps():
                r = src.restore(step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(),
                    meta=ocp.args.JsonRestore(),
                ))
                dst.save(step, args=ocp.args.Composite(
                    state=ocp.args.StandardSave(downgrade(r["state"])),
                    meta=ocp.args.JsonSave(r["meta"]),
                ))
            dst.wait_until_finished()
        finally:
            src.close()
            dst.close()

    migrated = tmp_path / "migrated"
    summary = migrate_checkpoint_tree(legacy, migrated)
    assert all(n > 0 for _, n in summary["best"] + summary["rolling"])

    p_orig = SELDPredictor(tiny_crnn_ckpt, batch_windows=1)
    p_migr = SELDPredictor(migrated, batch_windows=1)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    mel = jnp.asarray(
        rng.standard_normal(
            (1, p_orig.win, 4, p_orig.cfg.model.n_mels)
        ).astype(np.float32)
    )
    a = np.asarray(p_orig._forward(p_orig.state, mel))
    b = np.asarray(p_migr._forward(p_migr.state, mel))
    assert np.array_equal(a, b), "migrated checkpoint must be output-identical"

    # idempotence: a class-major tree passes through with zero permutes
    again = tmp_path / "again"
    summary2 = migrate_checkpoint_tree(migrated, again)
    assert all(n == 0 for _, n in summary2["best"] + summary2["rolling"])
