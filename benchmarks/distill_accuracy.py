"""Accuracy study: knowledge distillation (train.distill_ckpt) with a
NON-COLLAPSED teacher — the trained capstone flagship.

Round 3's version of this study used a fixture-scale CPU teacher that
never left the collapse regime (teacher SELD_error 0.988, F/LR columns
identical across teacher/plain/distilled) and therefore demonstrated
nothing (round-3 review, weak #2). This version runs on the chip with:

  * TEACHER: the trained 30-epoch capstone flagship
    (benchmarks/flagship_synth_accuracy.py — ResNet50-Conformer,
    mel_iv + ACS + EMA + SpecAugment, best checkpoint picked on val
    SELD_error; F_macro ~0.84 on held-out scenes). Its persistent
    state dir (benchmarks/state/flagship_e30_c24) is REQUIRED — run
    the capstone first.
  * STUDENTS: the exact `crnn_student_16_32_64` configuration that
    student_serving.json prices at 3.52x the flagship's serving
    throughput — trained twice under the SAME budget on the SAME
    corpus the teacher saw, once plain (hard CE only) and once
    distilled (alpha=0.5, T=2), both with the capstone's
    ACS/SpecAugment/EMA/metric-selection recipe. The student budget is
    deliberately tight (DISTILL_EPOCHS, default 8 — the regime where
    soft targets carry information hard labels don't).
  * METRICS: the DCASE2022 eval table per model, the distilled
    student under int8 PTQ (the intended serving config), and a
    QUALITY-INDEPENDENT statistic like int8_accuracy.json's: per-cell
    argmax AGREEMENT of each student with the teacher on held-out
    scenes (overall + on the cells where the teacher predicts an
    event). Distillation's mechanism is mimicry, so
    agreement(distilled, teacher) > agreement(plain, teacher) must
    hold regardless of where absolute accuracy lands.
  * NEGATIVE CONTROL: the first run of this study (round 4, v1) used
    UNWEIGHTED grid KD and measured the distilled student collapsing
    toward background (non_bg 57.4% -> 24.9%, SELD_error 0.237 ->
    0.497 vs the plain student) — >99% of grid cells are background
    the teacher is near-certain about, so uniform KL pressure drowns
    the event signal the background-down-weighted hard CE protects.
    That run's checkpoint is kept (student_distilled_uniform_kd row)
    as the measured justification for the class-weighted KD that
    `seld_tpu.distill.load_teacher` now bakes into grid distillation.

Student training state persists under benchmarks/state/ (per-workdir
`train_done.json` markers) so reruns only retrain what changed.

Writes benchmarks/results/distill_accuracy.json.
Run on the chip in background; NEVER timeout-kill (wedges the grant).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

RESULTS = REPO / "benchmarks" / "results"
TEACHER_STATE = Path(os.environ.get(
    "DISTILL_TEACHER", REPO / "benchmarks" / "state" / "flagship_e30_c24"
))
EPOCHS = int(os.environ.get("DISTILL_EPOCHS", "8"))


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
    }


def argmax_grids(cfg, ckpt_dir, corpus) -> np.ndarray:
    """(N, T, G) int8 plain-decode argmax classes of a checkpoint on a
    corpus — the representation the agreement statistic compares."""
    import jax.numpy as jnp

    from seld_tpu.data.sampler import BatchIterator
    from seld_tpu.models import build_model
    from seld_tpu.train import create_train_state, make_optimizer
    from seld_tpu.train.checkpoint import (
        CheckpointManager,
        load_checkpoint_config,
    )

    cfg = cfg.replace_path("model", load_checkpoint_config(ckpt_dir).model)
    model = build_model(cfg.model, cfg.grid)
    sample = jnp.zeros(
        (cfg.train.batch_size, corpus.window_frames, corpus.mel.shape[1],
         cfg.model.n_mels), jnp.float32,
    )
    template = create_train_state(
        model, make_optimizer(1e-3), jax.random.PRNGKey(0), sample
    )
    mgr = CheckpointManager(ckpt_dir, cfg)
    state, _ = mgr.restore_best(template)
    mgr.close()

    @jax.jit
    def fwd(st, mel):
        out = model.apply(st.variables(), mel, train=False)
        return jnp.argmax(out, axis=2).astype(jnp.int8)  # class axis

    rows = []
    for batch in BatchIterator(corpus, cfg.train.batch_size, shuffle=False):
        rows.append(np.asarray(fwd(state, jnp.asarray(batch.mel)))
                    [: batch.n_valid])
    return np.concatenate(rows, axis=0)


def main():
    RESULTS.mkdir(exist_ok=True)
    from bench import wait_for_accelerator

    wait_for_accelerator()
    assert jax.default_backend() == "tpu", jax.default_backend()
    if not (TEACHER_STATE / "ckpt").exists():
        raise FileNotFoundError(
            f"teacher state not found under {TEACHER_STATE} — run "
            "benchmarks/flagship_synth_accuracy.py first (it persists "
            "its trained checkpoints there)"
        )

    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import train_model
    from seld_tpu.train.state import param_count

    state_dir = REPO / "benchmarks" / "state" / f"distill_students_e{EPOCHS}"
    state_dir.mkdir(parents=True, exist_ok=True)
    tmp = state_dir  # per-student workdirs, persistent across reruns
    # the capstone recipe/corpus, with the serving study's student arch
    student_base = [
        "features.feature_set=mel_iv",
        "loss.loss_type=ce",
        "model.model_type=crnn",
        "model.crnn_cnn_channels=16,32",
        "model.crnn_rnn_hidden=64",
        "model.crnn_rnn_layers=1",
        "train.batch_size=16",
        "train.learning_rate=3e-4",
        f"train.num_epochs={EPOCHS}",
        f"train.patience={EPOCHS}",
        "train.save_every_n_epochs=1",
        "train.acs_augment=true",
        "train.specaugment_time_masks=2",
        "train.specaugment_freq_masks=2",
        "train.ema_decay=0.98",
        "train.select_metric=seld_error",
        f"data.base_path={tmp}",
    ]
    cfg_plain = parse_overrides(Config(), student_base)
    cfg_dist = parse_overrides(Config(), student_base + [
        f"train.distill_ckpt={TEACHER_STATE / 'ckpt'}",
        "train.distill_alpha=0.5",
        "train.distill_temperature=2.0",
    ])

    # the capstone's exact corpus (same seeds/scale/rates)
    train_c = synthetic_corpus(cfg_plain, n_files=24, seconds=120.0, seed=0,
                               doa_step_deg=45, event_rate_hz=0.4)
    test_c = synthetic_corpus(cfg_plain, n_files=6, seconds=60.0, seed=100,
                              train=False, doa_step_deg=45, event_rate_hz=0.4)
    log(f"corpus: {len(train_c)} train / {len(test_c)} test windows; "
        f"student budget {EPOCHS} epochs")

    results = {"student_epochs": EPOCHS,
               "teacher_state": str(TEACHER_STATE)}

    def train_student(cfg_s, workdir) -> None:
        marker = workdir / "train_done.json"
        if marker.exists():
            log(f"{workdir.name}: reusing trained state "
                f"({json.loads(marker.read_text())})")
            return
        t0 = time.time()
        st, _ = train_model(cfg_s, train_c, test_c, workdir=workdir)
        marker.write_text(json.dumps({
            "seconds": round(time.time() - t0),
            "params": int(param_count(st)),
        }) + "\n")
        log(f"{workdir.name}: trained in {time.time() - t0:.0f}s "
            f"({int(param_count(st)):,} params)")

    train_student(cfg_plain, tmp / "student_plain")
    train_student(cfg_dist, tmp / "student_distilled")
    results["student_params"] = json.loads(
        (tmp / "student_plain" / "train_done.json").read_text())["params"]

    eval_rows = {
        "teacher": (cfg_plain, TEACHER_STATE / "ckpt", False),
        "student_plain": (cfg_plain, tmp / "student_plain", False),
        "student_distilled": (cfg_dist, tmp / "student_distilled", False),
        "student_distilled_int8": (cfg_dist, tmp / "student_distilled", True),
    }
    # negative control: the uniform-KD distilled student from the v1 run
    # (see module docstring) — evaluated, never retrained
    uniform = tmp / "student_distilled_uniform_kd"
    if uniform.exists():
        eval_rows["student_distilled_uniform_kd"] = (cfg_dist, uniform, False)
    for name, (cfg_e, ckpt, int8) in eval_rows.items():
        m = evaluate_model(cfg_e, test_c, ckpt, save_visualizations=False,
                           int8=int8)
        results[name] = pick(m)
        log(name, json.dumps(results[name]))
        print(json.dumps({name: results[name]}), flush=True)

    # quality-independent statistic: argmax agreement with the teacher
    g_teacher = argmax_grids(cfg_plain, TEACHER_STATE / "ckpt", test_c)
    bg = cfg_plain.grid.num_classes - 1
    ev = g_teacher != bg  # cells where the teacher predicts an event
    agreement = {}
    agree_rows = [("plain", tmp / "student_plain"),
                  ("distilled", tmp / "student_distilled")]
    if uniform.exists():
        agree_rows.append(("distilled_uniform_kd", uniform))
    for name, ckpt in agree_rows:
        g = argmax_grids(cfg_plain, ckpt, test_c)
        agreement[name] = {
            "overall": round(float((g == g_teacher).mean()), 6),
            "teacher_event_cells": round(float((g[ev] == g_teacher[ev]).mean()), 6),
            "n_teacher_event_cells": int(ev.sum()),
        }
        log(f"agreement[{name}]: {agreement[name]}")
    results["teacher_argmax_agreement"] = agreement

    (RESULTS / "distill_accuracy.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )

    # Join the serving payoff table with accuracy (round-3 review #2/#6:
    # "a 3.52x-faster student is only meaningful paired with its
    # accuracy at the served config"): annotate student_serving.json's
    # measured rows with the accuracy each config reaches here.
    serving_f = RESULTS / "student_serving.json"
    if serving_f.exists():
        serving = json.loads(serving_f.read_text())
        acc_of = {
            "resnet_conformer_flagship": ("teacher", results["teacher"]),
            "crnn_student_16_32_64": (
                "student_distilled", results["student_distilled"]),
        }
        for row, (label, acc) in acc_of.items():
            if row in serving and isinstance(serving[row], dict):
                serving[row]["accuracy"] = {
                    "config": label,
                    "F_macro": acc["F_macro"],
                    "LE_macro": acc["LE_macro"],
                    "SELD_error": acc["SELD_error"],
                    "source": "distill_accuracy.json",
                }
        for row in ("crnn_reference", "conformer_reference"):
            if row in serving and isinstance(serving[row], dict):
                serving[row].setdefault(
                    "accuracy",
                    {"note": "throughput-only row (untrained init "
                             "weights; dense forwards are "
                             "weight-independent)"},
                )
        serving_f.write_text(json.dumps(serving, indent=2) + "\n")
        log("student_serving.json annotated with accuracy columns")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
