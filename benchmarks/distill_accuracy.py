"""Accuracy study: knowledge distillation (train.distill_ckpt) on
synthetic FOA data.

Companion to tta_swa_accuracy.py / int8_accuracy.py: trains a mid-size
CRNN teacher on the synthetic STARSS22-format corpus, then trains a
much smaller student twice under the SAME budget — once plain (hard
labels only) and once distilled against the teacher (alpha=0.5, T=2) —
and compares eval metrics. The claim under test is the one the
distillation recipe makes (docs/RECIPES.md): a student trained with a
teacher's soft targets localizes/detects better than the same student
trained on hard labels alone, approaching the teacher at a fraction of
its size. Also scores the distilled student under int8 PTQ (eval
--int8 path) — the intended serving configuration.

Synthetic scenes are FOA-panned with doa_step_deg=45 (24 directions,
learnable at fixture scale — see data/synthetic.py); weighted CE as the
hard loss (point-target MSE is unlearnable on sparse scenes, see
tta_swa_accuracy.py's overrides comment). Not a STARSS22 accuracy claim
— end-to-end evidence the lever behaves as designed.

Runs on CPU (forced) — small models, minutes. Writes
benchmarks/results/distill_accuracy.json.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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
    }


def main():
    RESULTS.mkdir(exist_ok=True)
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import train_model
    from seld_tpu.train.state import param_count

    import atexit
    import shutil

    tmp = Path(tempfile.mkdtemp(prefix="distill_acc_"))
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    base = [
        "features.feature_set=mel_iv",
        "model.model_type=crnn",
        "model.compute_dtype=float32",
        "window.window_seconds=2.0",
        "window.hop_seconds=1.0",
        "train.batch_size=8",
        "train.save_every_n_epochs=1",
        # weighted CE: the learnable hard loss at fixture scale (see
        # module docstring)
        "loss.loss_type=ce",
        f"data.base_path={tmp}",
    ]
    # teacher: the tta_swa_accuracy.py model (known to learn this corpus)
    cfg_teacher = parse_overrides(Config(), base + [
        "model.crnn_cnn_channels=16,32",
        "model.crnn_rnn_hidden=64",
        "model.crnn_rnn_layers=1",
        "train.num_epochs=60",
        "train.patience=60",
    ])
    # student: ~10x smaller
    student = [
        "model.crnn_cnn_channels=8,16",
        "model.crnn_rnn_hidden=16",
        "model.crnn_rnn_layers=1",
        "train.num_epochs=40",
        "train.patience=40",
    ]
    cfg_plain = parse_overrides(Config(), base + student)
    cfg_dist = parse_overrides(Config(), base + student + [
        f"train.distill_ckpt={tmp / 'teacher'}",
        "train.distill_alpha=0.5",
        "train.distill_temperature=2.0",
    ])

    train_c = synthetic_corpus(cfg_teacher, n_files=6, seconds=30.0, seed=0,
                               doa_step_deg=45)
    test_c = synthetic_corpus(cfg_teacher, n_files=2, seconds=30.0, seed=100,
                              train=False, doa_step_deg=45)
    log(f"corpus: {len(train_c)} train / {len(test_c)} test windows")

    results = {}

    import time

    t0 = time.time()
    t_state, _ = train_model(cfg_teacher, train_c, test_c,
                             workdir=tmp / "teacher")
    results["teacher_params"] = int(param_count(t_state))
    log(f"teacher trained in {time.time() - t0:.0f}s "
        f"({results['teacher_params']:,} params)")

    s_state, _ = train_model(cfg_plain, train_c, test_c,
                             workdir=tmp / "student_plain")
    results["student_params"] = int(param_count(s_state))
    log(f"plain student done ({results['student_params']:,} params)")
    train_model(cfg_dist, train_c, test_c, workdir=tmp / "student_distilled")
    log("distilled student done")

    for name, (cfg_e, ckpt, int8) in {
        "teacher": (cfg_teacher, tmp / "teacher", False),
        "student_plain": (cfg_plain, tmp / "student_plain", False),
        "student_distilled": (cfg_dist, tmp / "student_distilled", False),
        "student_distilled_int8": (cfg_dist, tmp / "student_distilled", True),
    }.items():
        m = evaluate_model(cfg_e, test_c, ckpt, save_visualizations=False,
                           int8=int8)
        results[name] = pick(m)
        log(name, json.dumps(results[name]))
        print(json.dumps({name: results[name]}), flush=True)

    (RESULTS / "distill_accuracy.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
