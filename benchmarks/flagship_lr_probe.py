"""Diagnose the flagship synthetic-accuracy collapse: LR / stability probe.

The first flagship_synth_accuracy run (ResNet50-Conformer, bf16, CE,
lr=1e-3 plateau — the reference's default LR, ref config.py:52) collapsed
to background on the learnable FOA corpus and stopped at 19/40 epochs —
the signature of a NaN abort (trainer.py:520-528) after an unstable
ascent (epoch-8 val SELD_error 2.11 = mass false positives, then
collapse). The small-CRNN study at the same LR learned fine, so the
hypothesis is the classic one: 1e-3 Adam is too hot for a ~60M-param
ResNet50-Conformer at batch 16, not a framework defect.

This probe trains the EXACT production recipe (mel_iv + ACS + EMA +
select_metric=seld_error, the flagship_synth_accuracy.py overrides) on a
smaller synthetic corpus for a few epochs per LR variant, all in one
process (LR is injected into opt_state — set_learning_rate — so every
variant reuses the same compiled step). Output: per-epoch train loss /
val SELD_error per variant + any aborted_epoch, committed as
benchmarks/results/flagship_lr_probe.json.

Run from the repo root with the axon sitecustomize on PYTHONPATH; size
the run to finish — never timeout-kill a TPU-attached process.
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


VARIANTS = [
    # name, overrides
    ("lr1e-3_plateau", ["train.learning_rate=1e-3"]),
    ("lr3e-4_plateau", ["train.learning_rate=3e-4"]),
    ("lr1e-4_plateau", ["train.learning_rate=1e-4"]),
    ("lr3e-4_cosine_warmup", [
        "train.learning_rate=3e-4",
        "train.lr_schedule=cosine",
        "train.warmup_steps=50",
    ]),
]


def main():
    import os

    smoke = os.environ.get("FLAGSHIP_SMOKE") == "1"
    if smoke:
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
    from seld_tpu.train import train_model

    import atexit
    import shutil

    tmp = Path(tempfile.mkdtemp(prefix="flagship_probe_"))
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    n_epochs = 2 if smoke else 10
    cfg = parse_overrides(Config(), [
        "model.model_type=resnet_conformer",
        "features.feature_set=mel_iv",
        "loss.loss_type=ce",
        "train.batch_size=16",
        f"train.num_epochs={n_epochs}",
        f"train.patience={n_epochs}",
        "train.save_every_n_epochs=1000",  # probe: no rolling ckpts
        "train.acs_augment=true",
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
        ])
    n_tr, s_tr = (2, 10.0) if smoke else (4, 60.0)
    train_c = synthetic_corpus(cfg, n_files=n_tr, seconds=s_tr, seed=0,
                               doa_step_deg=45)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=s_tr, seed=100,
                              train=False, doa_step_deg=45)
    log(f"probe corpus: {len(train_c)} train / {len(test_c)} test windows")

    import time

    results = {"train_windows": len(train_c), "epochs": n_epochs,
               "variants": {}}
    for name, extra in VARIANTS:
        vcfg = parse_overrides(cfg, extra)
        wd = tmp / name
        t0 = time.time()
        _, hist = train_model(vcfg, train_c, test_c, workdir=wd)
        wall = time.time() - t0
        recs = [json.loads(l) for l in
                (wd / "metrics.jsonl").read_text().splitlines()]
        row = {
            "train_loss": [round(r["train"]["loss"], 5) for r in recs],
            "val_seld_error": [
                round(r["val_dcase2022"]["SELD_error"], 4) for r in recs
            ],
            "aborted_epoch": hist.get("aborted_epoch"),
            "wall_s": round(wall, 1),
        }
        results["variants"][name] = row
        log(name, json.dumps(row))

    if not smoke:
        (RESULTS / "flagship_lr_probe.json").write_text(
            json.dumps(results, indent=2) + "\n"
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
