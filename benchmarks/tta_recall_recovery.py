"""Does decode calibration recover TTA's recall suppression on moving
sources? (Round-5 follow-up to `moving_source_decode.py`.)

The moving-source study measured that TTA-16 sharpens localization
everywhere (LE 65->45 deg at 90 deg/s) but SUPPRESSES recall, worst
under fast motion (LR 0.29->0.11, net SELD 0.696->0.712): per-view
disagreement grows with motion and the decoded average drops
low-agreement detections. RECIPES.md then *advises* "compose TTA with a
bg-bias/threshold recalibration if recall matters on moving sources" —
advice that had no measurement behind it. This study supplies (or
refutes) it, end to end through the PRODUCTION calibration workflow
(`seld_tpu.calibrate.run_calibration` — the same two-pass sweep
`seld_tpu calibrate` runs), not an ad-hoc sweep:

  1. train ONE grid conformer exactly like moving_source_decode.py
     (ACS-augmented, CE loss — reference monolith pairing — on a 50/50
     static + moving@45deg/s mix; ref loss semantics
     /root/reference/trainer.py:99-101, rasterizer semantics
     /root/reference/dataset.py:60-119);
  2. calibrate the TTA-16 decode path (bg_bias pass then median-width
     pass) TWICE on held-out validation corpora: once on STATIC scenes,
     once on MOVING-FAST (90 deg/s) scenes — the transfer question
     "must the calibration data be motion-representative?" is exactly
     the static-vs-moving gap between the two calibrations;
  3. score four decodes on the three held-out TEST corpora
     (static / 20 deg/s / 90 deg/s, same generation parameters as
     moving_source_decode.json's test set): plain (control), TTA at
     defaults (the measured recall-suppression baseline), TTA with the
     static-calibrated knobs, TTA with the moving-calibrated knobs.

The artifact's `recall_recovery` block reports, per test corpus, the
TTA LR/SELD at defaults vs each calibration — the quantified answer to
"does the calibrate command buy back the recall TTA costs under
motion?".

Same-protocol caveat: the model is RETRAINED under
moving_source_decode.py's exact recipe (its study state was transient),
so numbers are statistically comparable to moving_source_decode.json,
not bit-identical.

Env knobs (CPU smoke / reduced scale): TRR_ALLOW_CPU=1, TRR_EPOCHS,
TRR_TRAIN_CLIPS, TRR_CLIP_SECONDS, TRR_VAL_CLIPS, TRR_TEST_CLIPS,
TRR_OUT, TRR_STATE. State persists under benchmarks/state/<TRR_STATE>
via run_training_stage (preemption-proof markers). Run on the chip in
background via run_chip_jobs.py; NEVER timeout-kill (wedges the grant).
Writes benchmarks/results/tta_recall_recovery.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = REPO / "benchmarks" / "results"
EPOCHS = int(os.environ.get("TRR_EPOCHS", "12"))
TRAIN_CLIPS = int(os.environ.get("TRR_TRAIN_CLIPS", "8"))  # per condition
CLIP_SECONDS = float(os.environ.get("TRR_CLIP_SECONDS", "60"))
VAL_CLIPS = int(os.environ.get("TRR_VAL_CLIPS", "3"))
TEST_CLIPS = int(os.environ.get("TRR_TEST_CLIPS", "4"))
ALLOW_CPU = os.environ.get("TRR_ALLOW_CPU", "") == "1"
OUT_NAME = os.environ.get("TRR_OUT", "tta_recall_recovery.json")
STATE_NAME = os.environ.get("TRR_STATE", "tta_recall_recovery")
EVENT_RATE = 1.0
TRAIN_SPEED = 45.0
FAST_SPEED = 90.0
TTA16 = tuple(range(16))

_METRIC_KEYS = ("ER", "F_macro", "LE_macro", "LR_macro", "SELD_error")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pick(metrics: dict) -> dict:
    d22 = metrics["dcase2022"]
    out = {k: round(float(d22[k]), 4) for k in _METRIC_KEYS}
    out["LE_macro"] = round(float(d22["LE_macro"]), 2)
    return out


def main():
    RESULTS.mkdir(exist_ok=True)
    if ALLOW_CPU:
        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import wait_for_accelerator

        wait_for_accelerator()
        assert jax.default_backend() == "tpu", jax.default_backend()

    from seld_tpu.calibrate import run_calibration
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.data.corpus import build_corpus
    from seld_tpu.data.synthetic import synthetic_raw_files
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import run_training_stage

    state_dir = REPO / "benchmarks" / "state" / STATE_NAME
    state_dir.mkdir(parents=True, exist_ok=True)

    # Identical recipe to moving_source_decode.py (kept in lockstep so
    # the two artifacts stay statistically comparable).
    cfg = parse_overrides(Config(), [
        "model.model_type=conformer",
        "features.feature_set=mel_iv",
        "loss.loss_type=ce",
        "train.batch_size=16",
        "train.learning_rate=3e-4",
        "train.save_every_n_epochs=1",
        "train.acs_augment=true",
        "train.specaugment_time_masks=2",
        "train.specaugment_freq_masks=2",
        "train.ema_decay=0.98",
        "train.select_metric=seld_error",
        f"train.num_epochs={EPOCHS}",
        f"train.patience={EPOCHS}",
        f"data.base_path={state_dir}",
    ])

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        a1, m1 = synthetic_raw_files(
            tmp / "static", cfg, n_files=TRAIN_CLIPS, seconds=CLIP_SECONDS,
            seed=0, doa_step_deg=45, event_rate_hz=EVENT_RATE,
        )
        a2, m2 = synthetic_raw_files(
            tmp / "moving", cfg, n_files=TRAIN_CLIPS, seconds=CLIP_SECONDS,
            seed=1, doa_step_deg=45, event_rate_hz=EVENT_RATE,
            motion_deg_per_s=TRAIN_SPEED,
        )
        train_c = build_corpus(a1 + a2, m1 + m2, cfg.features, cfg.grid,
                               cfg.window, cfg.targets, train=True)

    # Val (calibration) corpora: seed disjoint from both train (0/1)
    # and test (100).
    vals = {
        "static": synthetic_corpus(
            cfg, n_files=VAL_CLIPS, seconds=CLIP_SECONDS, seed=200,
            train=False, doa_step_deg=45, event_rate_hz=EVENT_RATE),
        "moving_fast": synthetic_corpus(
            cfg, n_files=VAL_CLIPS, seconds=CLIP_SECONDS, seed=200,
            train=False, doa_step_deg=45, event_rate_hz=EVENT_RATE,
            motion_deg_per_s=FAST_SPEED),
    }
    tests = {}
    for name, speed in (("static", None), ("moving_slow", 20.0),
                        ("moving_fast", FAST_SPEED)):
        tests[name] = synthetic_corpus(
            cfg, n_files=TEST_CLIPS, seconds=CLIP_SECONDS, seed=100,
            train=False, doa_step_deg=45, event_rate_hz=EVENT_RATE,
            motion_deg_per_s=speed,
        )
    log(f"corpus: {len(train_c)} train windows; "
        + ", ".join(f"val[{k}]={len(v)}" for k, v in vals.items()) + "; "
        + ", ".join(f"test[{k}]={len(v)}" for k, v in tests.items()))

    ckpt = state_dir / "model"
    info = run_training_stage(cfg, train_c, tests["static"], ckpt)

    results = {
        "epochs": EPOCHS,
        "train": f"{TRAIN_CLIPS}x{CLIP_SECONDS:g}s static + "
                 f"{TRAIN_CLIPS}x{CLIP_SECONDS:g}s moving@{TRAIN_SPEED:g}"
                 f"deg/s, doa_step=45, rate={EVENT_RATE}/s",
        "val": f"{VAL_CLIPS}x{CLIP_SECONDS:g}s per condition, seed 200",
        "test": f"{TEST_CLIPS}x{CLIP_SECONDS:g}s per corpus, seed 100",
        "params": info["params"],
    }

    # TTA-path calibrations (the production two-pass sweep) on each
    # validation condition.
    calibs = {}
    for vname, vcorpus in vals.items():
        calib = run_calibration(cfg, vcorpus, ckpt, tta_transforms=TTA16)
        calibs[vname] = calib
        results[f"calibration_{vname}"] = {
            "bg_bias": calib["bg_bias"],
            "median_filter": calib["median_filter"],
            "val_metrics": calib["val_metrics"],
        }
        log(f"calibration[{vname}]: bg_bias={calib['bg_bias']:g} "
            f"median={calib['median_filter']} "
            f"val SELD {calib['val_metrics']['SELD_error']:.4f}")

    decodes = {
        "plain": dict(),
        "tta_default": dict(tta_transforms=TTA16),
        "tta_cal_static": dict(
            tta_transforms=TTA16, bg_bias=calibs["static"]["bg_bias"],
            median_filter=calibs["static"]["median_filter"]),
        "tta_cal_moving": dict(
            tta_transforms=TTA16, bg_bias=calibs["moving_fast"]["bg_bias"],
            median_filter=calibs["moving_fast"]["median_filter"]),
    }
    for tname, corpus in tests.items():
        for dname, kw in decodes.items():
            m = evaluate_model(cfg, corpus, ckpt, save_visualizations=False,
                               **kw)
            results[f"{tname}_{dname}"] = pick(m)
            log(f"{tname}_{dname}", json.dumps(results[f"{tname}_{dname}"]))

    # The headline block: per test corpus, did calibration buy back the
    # recall TTA costs (and at what net SELD)?
    recovery = {}
    for tname in tests:
        plain = results[f"{tname}_plain"]
        base = results[f"{tname}_tta_default"]
        row = {
            "plain_LR": plain["LR_macro"], "plain_SELD": plain["SELD_error"],
            "tta_default_LR": base["LR_macro"],
            "tta_default_SELD": base["SELD_error"],
        }
        for cal in ("cal_static", "cal_moving"):
            r = results[f"{tname}_tta_{cal}"]
            row[f"tta_{cal}_LR"] = r["LR_macro"]
            row[f"tta_{cal}_SELD"] = r["SELD_error"]
            row[f"tta_{cal}_dSELD_vs_default"] = round(
                r["SELD_error"] - base["SELD_error"], 4)
        recovery[tname] = row
    results["recall_recovery"] = recovery
    log("recall_recovery:", json.dumps(recovery))

    (RESULTS / OUT_NAME).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
