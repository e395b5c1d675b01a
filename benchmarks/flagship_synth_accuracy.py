"""Flagship capstone accuracy run on the real chip: ResNet50-Conformer
trained end to end on learnable synthetic FOA scenes.

The earlier accuracy study (tta_swa_accuracy.py) used a small CRNN on
CPU; this one drives the FLAGSHIP production recipe on the TPU:

  * resnet_conformer (the reference's default model, ref config.py:39),
    bf16 MXU compute, batch 16, 5 s windows — the bench.py shapes;
  * mel_iv spatial features + ACS augmentation + parameter EMA;
  * weighted CE (point-target MSE is unlearnable on sparse scenes —
    see tta_swa_accuracy.py's overrides comment);
  * SpecAugment + a dense event corpus: the first run (8x120 s clips at
    the legacy 2-8 events per CLIP — ~40 events total, 95% of windows
    pure background) memorized the train set (loss -> 0.012) and
    collapsed to background on val at every LR/schedule tried
    (benchmarks/results/flagship_lr_probe.json). This run sizes the
    corpus for a 60M-param model: event_rate_hz=0.4 (~48 events/clip),
    24 clips = 48 min, plus SpecAugment regularization, and evaluates a
    train-set slice alongside val to show the memorization gap closing;
  * train.select_metric=seld_error — the best checkpoint is chosen on
    the official DCASE2022 validation metric computed every epoch, not
    the test loss (this run is the chip validation of that feature);
  * post-training: SWA over the last rolling checkpoints, and ACS
    test-time augmentation, evaluated as variants.

Evidence produced (benchmarks/results/flagship_synth_accuracy.json):
per-epoch val-metric series (from metrics.jsonl), the epoch metric
selection picked vs the epoch loss selection WOULD have picked (both
with their seld_error), the eval table for best / best+TTA16 /
SWA / SWA+TTA16, and the decode stages — background-bias calibration
PER DECODE PATH (plain and SWA+TTA16 each get their own val sweep;
round 3's reduced-scale run showed a plain-calibrated bias collapsing
the TTA decode to all-background, because the bias enters pre-softmax
inside every TTA view and the two paths' optima differ), int8 PTQ, and
the full SWA+TTA16+bias+int8 composition. Not a STARSS22 claim
(synthetic scenes) — end-to-end evidence that the flagship recipe
learns genuine localization and the selection/averaging/decode levers
work at production scale on the chip.

Training state persists under benchmarks/state/flagship_e{E}_c{C}
(override: FLAGSHIP_STATE env): reruns skip straight to the decode
stages, and the distillation study reuses the trained flagship as its
teacher (benchmarks/distill_accuracy.py).

Run from the repo root with the axon sitecustomize on PYTHONPATH
(never overwrite it); size the run to finish — do not timeout-kill a
TPU-attached process.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = REPO / "benchmarks" / "results"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pick(metrics: dict) -> dict:
    d22 = metrics["dcase2022"]
    return {
        "test_loss": round(float(metrics["test_loss"]), 6),
        "overall_accuracy": round(float(metrics["overall_accuracy"]), 3),
        "non_bg_accuracy": round(float(metrics["non_bg_accuracy"]), 3),
        "ER": round(float(d22["ER"]), 4),
        "F_macro": round(float(d22["F_macro"]), 4),
        "LE_macro": round(float(d22["LE_macro"]), 2),
        "LR_macro": round(float(d22["LR_macro"]), 4),
        "SELD_error": round(float(d22["SELD_error"]), 4),
        "checkpoint_epoch": int(metrics["checkpoint_epoch"]),
    }


def main():
    import os

    smoke = os.environ.get("FLAGSHIP_SMOKE") == "1"
    # Reduced-scale chip runs (fewer epochs/clips, e.g. to fit a session
    # budget) write to a SEPARATE, scale-stamped artifact so the full
    # 30-epoch result is never overwritten by a weaker rerun — and two
    # reduced runs at different scales never overwrite each other.
    n_epochs = int(os.environ.get("FLAGSHIP_EPOCHS", "30"))
    n_clips = int(os.environ.get("FLAGSHIP_CLIPS", "24"))
    reduced = (n_epochs, n_clips) != (30, 24)
    out_name = (f"flagship_reduced_e{n_epochs}_c{n_clips}.json" if reduced
                else "flagship_synth_accuracy.json")
    if smoke:
        # plumbing-only validation: tiny model/corpus/epochs on CPU;
        # writes nothing under results/
        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import wait_for_accelerator

        wait_for_accelerator()
        if jax.default_backend() != "tpu":
            raise RuntimeError(
                f"needs the TPU backend, got {jax.default_backend()!r}"
            )

    RESULTS.mkdir(exist_ok=True)
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.tools.average_ckpt import average_checkpoints
    from seld_tpu.train import train_model

    import atexit
    import shutil

    if smoke:
        tmp = Path(tempfile.mkdtemp(prefix="flagship_synth_"))
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    else:
        # Persistent state (checkpoints, metrics.jsonl): post-training
        # decode stages can be rerun — and the distillation study can
        # reuse the trained flagship as its teacher — without paying the
        # ~95 min training again. Gitignored (checkpoints/ pattern).
        tmp = Path(os.environ.get(
            "FLAGSHIP_STATE",
            REPO / "benchmarks" / "state" / f"flagship_e{n_epochs}_c{n_clips}",
        ))
        tmp.mkdir(parents=True, exist_ok=True)
    cfg = parse_overrides(Config(), [
        # flagship production recipe at the bench shapes
        "model.model_type=resnet_conformer",
        "features.feature_set=mel_iv",
        "loss.loss_type=ce",
        "train.batch_size=16",
        "train.learning_rate=3e-4",
        f"train.num_epochs={n_epochs}",
        "train.patience=30",
        "train.save_every_n_epochs=1",
        "train.keep_last_n_checkpoints=5",
        "train.acs_augment=true",
        "train.specaugment_time_masks=2",
        "train.specaugment_freq_masks=2",
        "train.ema_decay=0.98",
        "train.select_metric=seld_error",
        f"data.base_path={tmp}",
    ])
    if smoke:
        cfg = parse_overrides(cfg, [
            "model.model_type=crnn",
            "model.crnn_cnn_channels=8,16",
            "model.crnn_rnn_hidden=16",
            "model.crnn_rnn_layers=1",
            "model.compute_dtype=float32",
            "window.window_seconds=1.0",
            "window.hop_seconds=0.5",
            "train.batch_size=4",
            "train.num_epochs=2",
            "train.patience=2",
        ])
    # doa_step_deg=45: 24-direction set, closed under the 16 ACS
    # transforms, so fixture-scale localization is learnable (see
    # data/synthetic.py). Held-out test scenes use the same direction
    # and class-tone conventions with fresh layouts.
    n_tr, s_tr, n_te, s_te = (2, 10.0, 1, 10.0) if smoke else (n_clips, 120.0, 6, 60.0)
    rate = 0.4  # events/s: ~48 events per 120 s training clip
    train_c = synthetic_corpus(cfg, n_files=n_tr, seconds=s_tr, seed=0,
                               doa_step_deg=45, event_rate_hz=rate)
    test_c = synthetic_corpus(cfg, n_files=n_te, seconds=s_te, seed=100,
                              train=False, doa_step_deg=45, event_rate_hz=rate)
    log(f"corpus: {len(train_c)} train / {len(test_c)} test windows "
        f"({n_tr * s_tr / 60:.0f} min of training audio; windows overlap)")

    import time

    done_marker = tmp / "train_done.json"
    metrics_file = tmp / "ckpt" / "metrics.jsonl"
    if done_marker.exists() and metrics_file.exists():
        saved = json.loads(done_marker.read_text())
        train_wall = saved["train_wall_s"]
        history = saved["history"]
        log(f"reusing trained state under {tmp} "
            f"({len(metrics_file.read_text().splitlines())} epoch records)")
    else:
        t0 = time.time()
        _, history = train_model(cfg, train_c, test_c, workdir=tmp / "ckpt")
        train_wall = time.time() - t0
        done_marker.write_text(json.dumps({
            "train_wall_s": round(train_wall, 1),
            "history": {
                "best_val_metric": history["best_val_metric"],
                "best_val_epoch": history["best_val_epoch"],
                "aborted_epoch": history.get("aborted_epoch"),
            },
        }))
    log(f"training wall: {train_wall:.0f}s, best {cfg.train.select_metric} "
        f"{history['best_val_metric']:.4f} @ epoch {history['best_val_epoch']}")

    # Selection comparison from the per-epoch record: which epoch would
    # loss selection have picked, and what seld_error does it carry?
    recs = [json.loads(l) for l in
            (tmp / "ckpt" / "metrics.jsonl").read_text().splitlines()]
    by_loss = min(recs, key=lambda r: r["test"]["loss"])
    by_metric = min(recs, key=lambda r: r["val_dcase2022"]["SELD_error"])
    selection = {
        "metric_pick": {"epoch": by_metric["epoch"],
                        "seld_error": by_metric["val_dcase2022"]["SELD_error"],
                        "test_loss": by_metric["test"]["loss"]},
        "loss_pick": {"epoch": by_loss["epoch"],
                      "seld_error": by_loss["val_dcase2022"]["SELD_error"],
                      "test_loss": by_loss["test"]["loss"]},
    }
    log("selection:", json.dumps(selection))

    swa_dir = tmp / "swa"
    shutil.rmtree(swa_dir, ignore_errors=True)  # recompute on reruns
    swa = average_checkpoints(tmp / "ckpt", swa_dir, last=5)
    log(f"SWA over epochs {swa['steps']}")

    results = {
        "train_windows": len(train_c),
        "test_windows": len(test_c),
        "epochs": len(recs),
        "aborted_epoch": history.get("aborted_epoch"),
        "train_wall_s": round(train_wall, 1),
        "val_seld_error_per_epoch": [
            r["val_dcase2022"]["SELD_error"] for r in recs
        ],
        "selection": selection,
        "swa_sources": swa["steps"],
    }
    # memorization diagnostic: the best checkpoint scored on the first
    # 4 TRAIN clips (identical per-clip RNG stream to the 24-clip run)
    train_slice = synthetic_corpus(cfg, n_files=min(4, n_tr), seconds=s_tr,
                                   seed=0, train=False, doa_step_deg=45,
                                   event_rate_hz=rate)
    m_tr = evaluate_model(cfg, train_slice, tmp / "ckpt",
                          save_visualizations=False)
    results["best_on_train_slice"] = pick(m_tr)
    log("best_on_train_slice", json.dumps(results["best_on_train_slice"]))
    for name, (ckpt, tta) in {
        "best": (tmp / "ckpt", None),
        "best_tta16": (tmp / "ckpt", tuple(range(16))),
        "swa": (swa_dir, None),
        "swa_tta16": (swa_dir, tuple(range(16))),
    }.items():
        m = evaluate_model(cfg, test_c, ckpt, save_visualizations=False,
                           tta_transforms=tta)
        results[name] = pick(m)
        log(name, json.dumps(results[name]))

    # Decode calibration at flagship scale, PER DECODE PATH: the bias
    # enters pre-softmax inside every TTA view, so the plain-decode
    # optimum does NOT transfer to the TTA-averaged decode — that
    # mismatch is how round 3's reduced-scale swa_tta16_bias stage
    # collapsed to all-background (a plain-calibrated bias applied
    # under TTA16). Each decode path gets its own sweep on a SEPARATE
    # validation corpus; tuned biases are then scored on held-out test.
    tune_c = synthetic_corpus(cfg, n_files=max(1, n_te // 2), seconds=s_te,
                              seed=300, train=False, doa_step_deg=45,
                              event_rate_hz=rate)
    biases = [-0.5, 0.0, 0.5, 1.0, 1.5, 2.0]

    # (a) plain decode on the best checkpoint
    m_sw = evaluate_model(cfg, tune_c, tmp / "ckpt",
                          save_visualizations=False, bg_bias_sweep=biases)
    results["bias_sweep_val"] = m_sw["bg_bias_sweep"]
    b_plain = float(m_sw["bg_bias_sweep"]["best"]["bg_bias"])
    log(f"bias sweep (val, seed 300, plain): best bg_bias {b_plain:+.2f}",
        json.dumps(m_sw["bg_bias_sweep"]["metrics"]))
    results["best_bias"] = pick(evaluate_model(
        cfg, test_c, tmp / "ckpt", save_visualizations=False,
        bg_bias=b_plain))
    log("best_bias", json.dumps(results["best_bias"]))

    # (b) SWA+TTA16 decode — calibrated UNDER the TTA average
    tta16 = tuple(range(16))
    m_sw_t = evaluate_model(cfg, tune_c, swa_dir, save_visualizations=False,
                            bg_bias_sweep=biases, tta_transforms=tta16)
    results["bias_sweep_val_swa_tta16"] = m_sw_t["bg_bias_sweep"]
    b_tta = float(m_sw_t["bg_bias_sweep"]["best"]["bg_bias"])
    log(f"bias sweep (val, seed 300, swa+tta16): best bg_bias {b_tta:+.2f}",
        json.dumps(m_sw_t["bg_bias_sweep"]["metrics"]))
    results["swa_tta16_bias"] = pick(evaluate_model(
        cfg, test_c, swa_dir, save_visualizations=False, bg_bias=b_tta,
        tta_transforms=tta16))
    log("swa_tta16_bias", json.dumps(results["swa_tta16_bias"]))

    # (c) the round-3 failing composition, kept as the root-cause
    # record: the PLAIN-calibrated bias applied under the TTA decode
    results["swa_tta16_bias_plaincal"] = pick(evaluate_model(
        cfg, test_c, swa_dir, save_visualizations=False, bg_bias=b_plain,
        tta_transforms=tta16))
    log("swa_tta16_bias_plaincal (round-3 composition)",
        json.dumps(results["swa_tta16_bias_plaincal"]))

    # Int8 accuracy gate at flagship scale (eval --int8): what PTQ costs
    # on a genuinely trained 60M-param model.
    results["best_int8"] = pick(evaluate_model(
        cfg, test_c, tmp / "ckpt", save_visualizations=False, int8=True))
    log("best_int8", json.dumps(results["best_int8"]))

    # Temporal majority smoothing (predict --median-filter): width tuned
    # on the validation corpus (host-side — the sweep costs one eval
    # pass), scored on held-out test.
    widths = [1, 3, 5, 7, 9]
    m_mf = evaluate_model(cfg, tune_c, tmp / "ckpt",
                          save_visualizations=False,
                          median_filter_sweep=widths)
    results["median_sweep_val"] = m_mf["median_filter_sweep"]
    w_star = int(m_mf["median_filter_sweep"]["best"]["median_filter"])
    log(f"median sweep (val, seed 300): best width {w_star}")
    results["best_median"] = pick(evaluate_model(
        cfg, test_c, tmp / "ckpt", save_visualizations=False,
        median_filter=w_star))
    log("best_median", json.dumps(results["best_median"]))

    # Full advertised composition: SWA + TTA16 + per-path bias + int8.
    results["swa_tta16_bias_int8"] = pick(evaluate_model(
        cfg, test_c, swa_dir, save_visualizations=False, bg_bias=b_tta,
        tta_transforms=tta16, int8=True))
    log("swa_tta16_bias_int8", json.dumps(results["swa_tta16_bias_int8"]))

    if reduced:
        results["reduced"] = {"epochs": n_epochs, "clips": n_clips}
    if not smoke:
        (RESULTS / out_name).write_text(
            json.dumps(results, indent=2) + "\n"
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
