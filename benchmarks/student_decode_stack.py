"""The full production decode stack, composed on distilled students.

The KD narrative so far measures each decode lever in isolation:
`multi_accdoa_distill*.json` scores plain decodes plus a bare
threshold sweep; `tta_recall_recovery.json` showed (for the GRID
family) that the calibrated-TTA operating point halves SELD vs any
single-lever decode. This study closes the loop for the ACCDOA family
on the models where operating points matter most — small distilled
students — by composing everything the serving path offers, through
the production calibration workflow (`seld_tpu.calibrate
.run_calibration`, the same two-pass sweep `seld_tpu calibrate` runs):

  per model (teacher, perm-KD student alpha=0.5, alpha=0.8):
    1. plain decode, defaults            (the baseline row)
    2. calibrate the PLAIN path on val   -> tuned threshold + median
    3. TTA-16 decode, defaults           (decoded-space activity votes)
    4. calibrate the TTA path on val     -> tuned threshold + median
    5. decode 4 under int8 PTQ           (the serving configuration)

All decodes scored on the held-out test corpus (seed 100), calibration
on the separate val corpus (seed 300) — the same corpora as the
distillation study, so rows are directly comparable with
`multi_accdoa_distill_e16.json`.

Training stages reuse `multi_accdoa_distill.py`'s exact state layout
and configs (default state `multi_accdoa_distill_e16`): on the chip the
completed `train_done.json` markers from that study make every training
stage a no-op, so this is an eval-only pass; on a fresh state (e.g. the
CPU smoke) the stages train the same models first — self-sufficient
either way, preemption-proof throughout (run_training_stage).

Multi-ACCDOA TTA background: per-view vectors are decoded to {0,1}
class-activity maps and majority-voted (raw track vectors are not
averageable across views — seld_tpu/tta.py); the activity threshold
gates each view BEFORE the vote, which is why the TTA-path optimum can
differ from the plain-path one and the calibration must run through
the decode it will serve (docs/RECIPES.md items 10-11).

Env knobs (CPU smoke / reduced scale): SDS_ALLOW_CPU=1,
SDS_TEACHER_EPOCHS, SDS_STUDENT_EPOCHS, SDS_TRAIN_CLIPS,
SDS_CLIP_SECONDS, SDS_OUT, SDS_STATE, SDS_SKIP_INT8=1 (skip the
int8+TTA rows — the XLA-CPU compile of the int8-intercepted TTA scan
on the full-size teacher runs >1 h on one host core, while the same
program compiles in seconds on the chip; the chip run is the int8
evidence). Run on the chip in background via run_chip_jobs.py; NEVER
timeout-kill (wedges the grant).
Writes benchmarks/results/student_decode_stack.json.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = REPO / "benchmarks" / "results"
TEACHER_EPOCHS = int(os.environ.get("SDS_TEACHER_EPOCHS", "16"))
STUDENT_EPOCHS = int(os.environ.get("SDS_STUDENT_EPOCHS", "16"))
TRAIN_CLIPS = int(os.environ.get("SDS_TRAIN_CLIPS", "16"))
CLIP_SECONDS = float(os.environ.get("SDS_CLIP_SECONDS", "60"))
ALLOW_CPU = os.environ.get("SDS_ALLOW_CPU", "") == "1"
OUT_NAME = os.environ.get("SDS_OUT", "student_decode_stack.json")
STATE_NAME = os.environ.get("SDS_STATE", "multi_accdoa_distill_e16")
SKIP_INT8 = os.environ.get("SDS_SKIP_INT8", "") == "1"
EVENT_RATE = 1.5
TTA16 = tuple(range(16))
THS = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7]

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
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import run_training_stage

    state_dir = REPO / "benchmarks" / "state" / STATE_NAME
    state_dir.mkdir(parents=True, exist_ok=True)

    # Configs kept in lockstep with multi_accdoa_distill.py so the
    # training-stage markers from that study are reusable as-is.
    base = [
        "features.feature_set=mel_iv",
        "targets.accdoa=true",
        "targets.accdoa_tracks=3",
        "train.batch_size=16",
        "train.learning_rate=3e-4",
        "train.save_every_n_epochs=1",
        "train.acs_augment=true",
        "train.specaugment_time_masks=2",
        "train.specaugment_freq_masks=2",
        "train.ema_decay=0.98",
        "train.select_metric=seld_error",
        f"data.base_path={state_dir}",
    ]
    teacher_over = base + [
        "model.model_type=multi_accdoa_conformer",
        f"train.num_epochs={TEACHER_EPOCHS}",
        f"train.patience={TEACHER_EPOCHS}",
    ]
    student_arch = [
        "model.model_type=multi_accdoa_conformer",
        "model.conf_d_model=96",
        "model.conf_n_heads=4",
        "model.conf_n_layers=1",
        f"train.num_epochs={STUDENT_EPOCHS}",
        f"train.patience={STUDENT_EPOCHS}",
    ]
    cfg_teacher = parse_overrides(Config(), teacher_over)
    teacher_dir = state_dir / "teacher"

    train_c = synthetic_corpus(cfg_teacher, n_files=TRAIN_CLIPS,
                               seconds=CLIP_SECONDS, seed=0, doa_step_deg=45,
                               event_rate_hz=EVENT_RATE)
    test_c = synthetic_corpus(cfg_teacher, n_files=6, seconds=CLIP_SECONDS,
                              seed=100, train=False, doa_step_deg=45,
                              event_rate_hz=EVENT_RATE)
    val_c = synthetic_corpus(cfg_teacher, n_files=3, seconds=CLIP_SECONDS,
                             seed=300, train=False, doa_step_deg=45,
                             event_rate_hz=EVENT_RATE)
    log(f"corpus: {len(train_c)} train / {len(val_c)} val / "
        f"{len(test_c)} test windows")

    run_training_stage(cfg_teacher, train_c, test_c, teacher_dir)
    models = {"teacher": (cfg_teacher, teacher_dir)}
    for name, alpha in (("student_perm_kd", 0.5),
                        ("student_perm_kd_a08", 0.8)):
        cfg_s = parse_overrides(Config(), base + student_arch + [
            f"train.distill_ckpt={teacher_dir}",
            f"train.distill_alpha={alpha}",
        ])
        run_training_stage(cfg_s, train_c, test_c, state_dir / name)
        models[name] = (cfg_s, state_dir / name)

    results = {
        "teacher_epochs": TEACHER_EPOCHS,
        "student_epochs": STUDENT_EPOCHS,
        "corpus": f"{TRAIN_CLIPS}x{CLIP_SECONDS:g}s train / "
                  f"3x{CLIP_SECONDS:g}s val (seed 300) / "
                  f"6x{CLIP_SECONDS:g}s test (seed 100), doa_step=45, "
                  f"rate={EVENT_RATE}/s",
        "state": STATE_NAME,
    }

    for name, (cfg_m, ckpt) in models.items():
        row = {}
        row["plain_default"] = pick(evaluate_model(
            cfg_m, test_c, ckpt, save_visualizations=False))
        log(f"{name} plain_default", json.dumps(row["plain_default"]))

        cal_plain = run_calibration(cfg_m, val_c, ckpt,
                                    threshold_grid=THS)
        row["plain_calibration"] = {
            "accdoa_threshold": cal_plain["accdoa_threshold"],
            "median_filter": cal_plain["median_filter"],
        }
        row["plain_calibrated"] = pick(evaluate_model(
            cfg_m, test_c, ckpt, save_visualizations=False,
            accdoa_threshold=cal_plain["accdoa_threshold"],
            median_filter=cal_plain["median_filter"]))
        log(f"{name} plain_calibrated th="
            f"{cal_plain['accdoa_threshold']:g} "
            f"mf={cal_plain['median_filter']}",
            json.dumps(row["plain_calibrated"]))

        row["tta_default"] = pick(evaluate_model(
            cfg_m, test_c, ckpt, save_visualizations=False,
            tta_transforms=TTA16))
        log(f"{name} tta_default", json.dumps(row["tta_default"]))

        cal_tta = run_calibration(cfg_m, val_c, ckpt, threshold_grid=THS,
                                  tta_transforms=TTA16)
        row["tta_calibration"] = {
            "accdoa_threshold": cal_tta["accdoa_threshold"],
            "median_filter": cal_tta["median_filter"],
        }
        tta_kw = dict(
            tta_transforms=TTA16,
            accdoa_threshold=cal_tta["accdoa_threshold"],
            median_filter=cal_tta["median_filter"],
        )
        row["tta_calibrated"] = pick(evaluate_model(
            cfg_m, test_c, ckpt, save_visualizations=False, **tta_kw))
        log(f"{name} tta_calibrated th={cal_tta['accdoa_threshold']:g} "
            f"mf={cal_tta['median_filter']}",
            json.dumps(row["tta_calibrated"]))

        if not SKIP_INT8:
            row["tta_calibrated_int8"] = pick(evaluate_model(
                cfg_m, test_c, ckpt, save_visualizations=False, int8=True,
                **tta_kw))
            log(f"{name} tta_calibrated_int8",
                json.dumps(row["tta_calibrated_int8"]))

        results[name] = row
        print(json.dumps({name: row}), flush=True)

    # Headline: best composed decode per model vs its plain default.
    summary = {}
    for name in models:
        r = results[name]
        variants = {k: r[k]["SELD_error"] for k in
                    ("plain_default", "plain_calibrated", "tta_default",
                     "tta_calibrated", "tta_calibrated_int8") if k in r}
        best = min(variants, key=variants.get)
        summary[name] = {
            "best_decode": best,
            "best_SELD": variants[best],
            "plain_default_SELD": variants["plain_default"],
            "delta": round(variants[best] - variants["plain_default"], 4),
        }
    results["summary"] = summary
    log("summary:", json.dumps(summary))

    (RESULTS / OUT_NAME).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
