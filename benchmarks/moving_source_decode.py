"""Does the decode stack hold up when sources MOVE?

STARSS22 metadata is per-100 ms-frame az/el — real sources move — and
the rasterizer has always accepted frame-level rows (the reference
consumes them row-by-row, ref dataset.py:60-119), but every accuracy
study so far used STATIC synthetic events, so the decode stack's
temporal components were never exercised against motion (VERDICT r4
item 4 / missing #3). The suspects, and why motion stresses them:

  * **temporal median smoothing** (`eval --median-filter W`): a width-W
    majority vote assumes the active cell is temporally stable; a
    source at 90 deg/s crosses a 10 deg azimuth cell every ~111 ms
    (~5.6 model frames at the 20 ms frame hop), so wide filters should
    start voting events out of existence right around W=5-9;
  * **TTA averaging** (`--tta`): each ACS view sees the same moving
    trajectory; the decoded-space average should be motion-neutral, but
    that is an assumption worth a measurement;
  * the plain per-frame argmax decode is the motion-oblivious control.

Protocol: ONE grid conformer trained (with ACS augmentation, so TTA is
meaningful; CE loss like the reference monolith) on a 50/50 mix of
static and moving (45 deg/s) scenes, then scored on three held-out
corpora: static, moving-slow (20 deg/s), moving-fast (90 deg/s). Each
corpus is evaluated once plain and once TTA-16, with a host-side
median width sweep [1, 3, 5, 7, 9] from the same forwards (zero extra
chip passes — `median_filter_sweep` semantics). The artifact's
`motion_sensitivity` block reports, per width, the SELD-error drift
from static to fast motion — the quantified answer to "does the tuned
static width transfer to moving scenes?".

Same-seed caveat: the three test corpora share a seed, but motion
draws consume extra RNG, so event layouts differ across corpora —
comparisons are statistical (4x60 s of test audio each), not paired.

Env knobs (CPU smoke / reduced scale): MSD_ALLOW_CPU=1, MSD_EPOCHS,
MSD_TRAIN_CLIPS (per condition), MSD_CLIP_SECONDS, MSD_OUT, MSD_STATE.
State persists under benchmarks/state/<MSD_STATE> via
run_training_stage (preemption-proof markers). Run on the chip in
background; NEVER timeout-kill (wedges the grant).
Writes benchmarks/results/moving_source_decode.json.
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
EPOCHS = int(os.environ.get("MSD_EPOCHS", "12"))
TRAIN_CLIPS = int(os.environ.get("MSD_TRAIN_CLIPS", "8"))  # per condition
CLIP_SECONDS = float(os.environ.get("MSD_CLIP_SECONDS", "60"))
ALLOW_CPU = os.environ.get("MSD_ALLOW_CPU", "") == "1"
OUT_NAME = os.environ.get("MSD_OUT", "moving_source_decode.json")
STATE_NAME = os.environ.get("MSD_STATE", "moving_source_decode")
EVENT_RATE = 1.0
TRAIN_SPEED = 45.0
WIDTHS = [1, 3, 5, 7, 9]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pick(metrics: dict) -> dict:
    d22 = metrics["dcase2022"]
    return {
        "test_loss": round(float(metrics["test_loss"]), 6),
        "non_bg_accuracy": round(float(metrics["non_bg_accuracy"]), 3),
        "ER": round(float(d22["ER"]), 4),
        "F_macro": round(float(d22["F_macro"]), 4),
        "LE_macro": round(float(d22["LE_macro"]), 2),
        "LR_macro": round(float(d22["LR_macro"]), 4),
        "SELD_error": round(float(d22["SELD_error"]), 4),
    }


def mixed_train_corpus(cfg, tmp: Path):
    """50/50 static + moving clips through the real file pipeline."""
    from seld_tpu.data.corpus import build_corpus
    from seld_tpu.data.synthetic import synthetic_raw_files

    a1, m1 = synthetic_raw_files(
        tmp / "static", cfg, n_files=TRAIN_CLIPS, seconds=CLIP_SECONDS,
        seed=0, doa_step_deg=45, event_rate_hz=EVENT_RATE,
    )
    a2, m2 = synthetic_raw_files(
        tmp / "moving", cfg, n_files=TRAIN_CLIPS, seconds=CLIP_SECONDS,
        seed=1, doa_step_deg=45, event_rate_hz=EVENT_RATE,
        motion_deg_per_s=TRAIN_SPEED,
    )
    return build_corpus(a1 + a2, m1 + m2, cfg.features, cfg.grid,
                        cfg.window, cfg.targets, train=True)


def main():
    RESULTS.mkdir(exist_ok=True)
    if ALLOW_CPU:
        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import wait_for_accelerator

        wait_for_accelerator()
        assert jax.default_backend() == "tpu", jax.default_backend()

    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import run_training_stage

    state_dir = REPO / "benchmarks" / "state" / STATE_NAME
    state_dir.mkdir(parents=True, exist_ok=True)

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
        train_c = mixed_train_corpus(cfg, Path(td))
    tests = {}
    for name, speed in (("static", None), ("moving_slow", 20.0),
                        ("moving_fast", 90.0)):
        tests[name] = synthetic_corpus(
            cfg, n_files=4, seconds=CLIP_SECONDS, seed=100, train=False,
            doa_step_deg=45, event_rate_hz=EVENT_RATE,
            motion_deg_per_s=speed,
        )
    log(f"corpus: {len(train_c)} train windows; test: " +
        ", ".join(f"{k}={len(v)}" for k, v in tests.items()))

    ckpt = state_dir / "model"
    info = run_training_stage(cfg, train_c, tests["static"], ckpt)

    results = {
        "epochs": EPOCHS,
        "train": f"{TRAIN_CLIPS}x{CLIP_SECONDS:g}s static + "
                 f"{TRAIN_CLIPS}x{CLIP_SECONDS:g}s moving@{TRAIN_SPEED:g}deg/s, "
                 f"doa_step=45, rate={EVENT_RATE}/s",
        "params": info["params"],
        "median_widths": WIDTHS,
    }
    for name, corpus in tests.items():
        for mode, tta in (("plain", None), ("tta16", tuple(range(16)))):
            m = evaluate_model(cfg, corpus, ckpt, save_visualizations=False,
                               tta_transforms=tta,
                               median_filter_sweep=WIDTHS)
            row = pick(m)
            row["median_sweep"] = m["median_filter_sweep"]
            results[f"{name}_{mode}"] = row
            log(f"{name}_{mode}", json.dumps(
                {k: v for k, v in row.items() if k != "median_sweep"}))
            best = row["median_sweep"]["best"]
            log(f"  median best: width {best['median_filter']} "
                f"SELD {best['SELD_error']:.4f}")

    # Motion sensitivity of the median filter: per width, SELD drift
    # from static to fast motion (plain decode path).
    sens = {}
    for w in WIDTHS:
        s = results["static_plain"]["median_sweep"]["metrics"][str(w)]
        f = results["moving_fast_plain"]["median_sweep"]["metrics"][str(w)]
        sens[str(w)] = {
            "static_SELD": round(float(s["SELD_error"]), 4),
            "fast_SELD": round(float(f["SELD_error"]), 4),
            "drift": round(float(f["SELD_error"] - s["SELD_error"]), 4),
        }
    results["motion_sensitivity"] = sens
    log("motion_sensitivity:", json.dumps(sens))

    (RESULTS / OUT_NAME).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
