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

    from seld_tpu.data.corpus import BatchIterator
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

    import tempfile

    tmp = Path(tempfile.mkdtemp(prefix="distill_acc_"))
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

    t0 = time.time()
    s_state, _ = train_model(cfg_plain, train_c, test_c,
                             workdir=tmp / "student_plain")
    results["student_params"] = int(param_count(s_state))
    log(f"plain student: {time.time() - t0:.0f}s "
        f"({results['student_params']:,} params)")
    t0 = time.time()
    train_model(cfg_dist, train_c, test_c, workdir=tmp / "student_distilled")
    log(f"distilled student: {time.time() - t0:.0f}s")

    for name, (cfg_e, ckpt, int8) in {
        "teacher": (cfg_plain, TEACHER_STATE / "ckpt", False),
        "student_plain": (cfg_plain, tmp / "student_plain", False),
        "student_distilled": (cfg_dist, tmp / "student_distilled", False),
        "student_distilled_int8": (cfg_dist, tmp / "student_distilled", True),
    }.items():
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
    for name, ckpt in (("plain", tmp / "student_plain"),
                       ("distilled", tmp / "student_distilled")):
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
    print(json.dumps(results))


if __name__ == "__main__":
    main()
