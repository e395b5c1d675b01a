"""Evaluation tests: accuracy parity semantics, SELD metric behavior on
constructed cases, end-to-end evaluate_model over a trained checkpoint."""

import numpy as np
import pytest

from seld_tpu.eval.metrics import accuracy_metrics, seld_metrics

I, J, M = 18, 36, 14
G = I * J
BG = M - 1


def grids(*events, frames=1):
    """Build (1, frames, G) class grids; events are (frame, cell, cls)."""
    g = np.full((1, frames, G), BG, np.int8)
    for f, cell, cls in events:
        g[0, f, cell] = cls
    return g


def test_accuracy_metrics_basic():
    true = grids((0, 10, 3), (0, 20, 5))
    pred = grids((0, 10, 3))  # one right, one missed
    m = accuracy_metrics(pred, true, BG)
    assert m["active_events"] == 2
    assert m["non_bg_accuracy"] == pytest.approx(50.0)
    assert m["overall_accuracy"] == pytest.approx((G - 1) / G * 100)


def test_seld_perfect_prediction():
    true = grids((0, 100, 3), (0, 200, 7))
    m = seld_metrics(true, true, I, J, M)
    assert m["ER"] == 0.0 and m["F"] == 1.0 and m["LR"] == 1.0
    assert m["LE"] == pytest.approx(0.0, abs=1e-3)


def test_seld_missed_and_spurious():
    true = grids((0, 100, 3))
    pred = grids((0, 200, 7))  # wrong class elsewhere
    m = seld_metrics(pred, true, I, J, M)
    assert m["tp"] == 0 and m["fn"] == 1 and m["fp"] == 1
    assert m["ER"] == pytest.approx(1.0)  # 1 substitution / 1 GT event
    assert m["F"] == 0.0 and m["LR"] == 0.0


def test_seld_within_threshold_neighbor_cell():
    # GT at cell (i=9, j=18); prediction one azimuth cell over (10 deg at
    # equator < 20 deg threshold) -> TP with LE ~ 10 deg * cos(el).
    c_true = 9 * J + 18
    c_pred = 9 * J + 19
    true = grids((0, c_true, 4))
    pred = grids((0, c_pred, 4))
    m = seld_metrics(pred, true, I, J, M)
    assert m["tp"] == 1 and m["fn"] == 0 and m["fp"] == 0
    assert 8.0 < m["LE"] < 11.0


def test_seld_out_of_threshold_same_class():
    # Same class detected but localized 90 deg away -> FN + FP, LE large.
    c_true = 9 * J + 0
    c_pred = 9 * J + 9  # 90 deg away in azimuth
    true = grids((0, c_true, 4))
    pred = grids((0, c_pred, 4))
    m = seld_metrics(pred, true, I, J, M)
    assert m["tp"] == 0 and m["fn"] == 1 and m["fp"] == 1
    assert m["LE"] > 80.0


def test_seld_macro_aggregation():
    # class 3 perfect (TP), class 7 missed (FN): micro F = 2/3,
    # macro F = mean(1.0, 0.0) = 0.5
    true = grids((0, 100, 3), (0, 300, 7))
    pred = grids((0, 100, 3))
    m = seld_metrics(pred, true, I, J, M)
    assert m["F"] == pytest.approx(2 / 3)
    assert m["F_macro"] == pytest.approx(0.5)
    assert m["LR_macro"] == pytest.approx(0.5)
    assert m["LE_macro"] == pytest.approx(0.0, abs=1e-3)  # only class 3 has LE


def test_evaluate_uses_checkpoint_architecture(tmp_path):
    """Eval must rebuild the TRAINED architecture from the stored config
    even when the live config says otherwise (the hazard the reference has,
    ref trainer.py:430-432)."""
    from tests.test_train import tiny_config

    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path)  # crnn
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")

    lying_cfg = cfg.replace_path("model.model_type", "conformer")
    results = evaluate_model(
        lying_cfg, test_c, tmp_path / "ckpt", num_visualizations=0
    )
    assert np.isfinite(results["test_loss"])  # crnn weights actually loaded


def test_evaluate_model_use_checkpoint(tmp_path):
    """use_checkpoint='latest' scores the newest ROLLING checkpoint (its
    epoch is the last trained epoch, not the best-test-loss one); bad
    values get a named error."""
    import pytest

    from tests.test_train import tiny_config

    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path, **{"train.num_epochs": "2"})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")

    latest = evaluate_model(cfg, test_c, tmp_path / "ckpt",
                            num_visualizations=0, use_checkpoint="latest")
    assert latest["checkpoint_epoch"] == 2  # newest rolling, by construction
    assert latest["checkpoint_kind"] == "latest"  # no silent substitution
    assert np.isfinite(latest["test_loss"])

    with pytest.raises(ValueError, match="use_checkpoint"):
        evaluate_model(cfg, test_c, tmp_path / "ckpt",
                       num_visualizations=0, use_checkpoint="final")


def test_evaluate_model_latest_fallback_is_reported(tmp_path):
    """When no rolling checkpoint exists (save cadence > num_epochs),
    use_checkpoint='latest' falls back to the BEST checkpoint and SAYS SO
    via checkpoint_kind — a silent substitution would make studies that
    decompose learning from selection (benchmarks/reference_parity.py)
    compare best-vs-best without noticing."""
    from tests.test_train import tiny_config

    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path, **{"train.save_every_n_epochs": "5"})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")

    m = evaluate_model(cfg, test_c, tmp_path / "ckpt",
                       num_visualizations=0, use_checkpoint="latest")
    assert m["checkpoint_kind"] == "best"  # the substitution is visible
    assert np.isfinite(m["test_loss"])


def test_evaluate_model_validates_widths_before_any_work(tmp_path):
    """Invalid median-filter widths must fail BEFORE the eval forward
    loop (they used to error only after every batch ran): with a
    nonexistent checkpoint dir the width error fires first, proving the
    validation precedes checkpoint load and all device work."""
    from tests.test_train import tiny_config

    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model

    cfg = tiny_config(tmp_path)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1)
    with pytest.raises(ValueError, match="odd"):
        evaluate_model(cfg, test_c, tmp_path / "does_not_exist",
                       num_visualizations=0, median_filter=4)
    with pytest.raises(ValueError, match="odd"):
        evaluate_model(cfg, test_c, tmp_path / "does_not_exist",
                       num_visualizations=0, median_filter_sweep=[1, 2])


def test_evaluate_model_end_to_end(tmp_path):
    from tests.test_train import tiny_config

    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0, train=True)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1, train=False)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")

    results = evaluate_model(cfg, test_c, tmp_path / "ckpt", num_visualizations=2)
    assert np.isfinite(results["test_loss"])
    assert 0 <= results["overall_accuracy"] <= 100
    assert {"ER", "F", "LE", "LR"} <= set(results["dcase"])
    assert results["num_frames_with_events"] > 0
    for viz in results["visualizations"]:
        import os

        assert os.path.exists(viz["save_path"])
