"""Int8 accuracy study on synthetic data (CPU; no chip needed).

Trains a small-but-not-tiny conformer on synthetic scenes, then
compares on held-out data:

  float        — the f32 baseline
  ptq          — post-training int8 (w8a8, self-calibrated)
  weight_only  — int8 weights, float compute
  qat_ptq      — the same architecture trained with train.qat=true,
                 then int8-PTQ'd (the accuracy-critical deployment path)

Reports per-cell argmax agreement with each variant's own float
reference, plus non-background frame F1 vs ground truth for every
variant. Scenes are FOA-panned with 45-deg-quantized DOAs
(data/synthetic.py — closed under the ACS transforms, clipping-safe),
so localization is learnable and held-out F1 is a real (if
fixture-scale) accuracy signal. Measured result (committed JSON):
argmax agreement >99.99% everywhere and PTQ/weight-only F1 within
noise of (slightly above) each model's float F1, for both the
float-trained and the QAT-trained model — int8 costs no accuracy on a
genuinely trained model here. The corpus-scale accuracy gate still
needs STARSS22; this exercises the full QAT->PTQ pipeline end to end.

Writes benchmarks/results/int8_accuracy.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", str(REPO / "tests/.jax_cache"))

import numpy as np  # noqa: E402

RESULTS = REPO / "benchmarks" / "results"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import tempfile

    import jax.numpy as jnp

    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.models import build_model
    from seld_tpu.quant import quantize_model, quantized_apply
    from seld_tpu.train import train_model

    import atexit
    import shutil

    root = Path(tempfile.mkdtemp(prefix="int8_acc_"))
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    base_over = [
        f"data.base_path={root}",
        "model.model_type=conformer",
        "model.conf_d_model=64",
        "model.conf_n_heads=4",
        "model.conf_n_layers=2",
        "model.compute_dtype=float32",
        "window.window_seconds=2.0",
        "window.hop_seconds=1.0",
        "train.batch_size=8",
        "train.num_epochs=30",
        "train.save_every_n_epochs=30",
        "train.patience=30",
        # weighted CE (the modular reference's recipe): point-target MSE
        # is unlearnable on sparse scenes (1 active cell in 648), so CE
        # is what makes the F1 columns meaningful here.
        "loss.loss_type=ce",
    ]
    cfg = parse_overrides(Config(), base_over)
    # FOA-panned clips at 45-deg-quantized DOAs: localization is
    # genuinely learnable (see data/synthetic.py), so held-out F1 is a
    # real accuracy signal now, not near-chance.
    train_c = synthetic_corpus(cfg, n_files=4, seconds=20.0, seed=0,
                               doa_step_deg=45)
    test_c = synthetic_corpus(cfg, n_files=2, seconds=12.0, seed=1,
                              doa_step_deg=45)

    def heldout_batches(corpus, n=2):
        out = []
        for i in range(n):
            idx = np.arange(i * 4, (i + 1) * 4) % len(corpus)
            mel, mask = corpus.gather(idx)
            out.append((np.asarray(mel), np.asarray(mask)))
        return out

    batches = heldout_batches(test_c)
    model = build_model(cfg.model, cfg.grid)

    def grid_metrics(logits, mask):
        """(per-cell argmax classes, frame-level F1 vs ground truth)."""
        cls = np.argmax(logits, axis=2)  # class-major (B,T,M,G) -> class
        bg = cfg.grid.num_classes - 1
        pred_active = cls != bg
        true_active = np.asarray(mask) != 0
        tp = (pred_active & true_active).sum()
        fp = (pred_active & ~true_active).sum()
        fn = (~pred_active & true_active).sum()
        f1 = 2 * tp / max(2 * tp + fp + fn, 1)
        return cls, float(f1)

    def evaluate(variables, qt=None):
        cells, f1s = [], []
        for mel, mask in batches:
            if qt is None:
                logits = model.apply(variables, jnp.asarray(mel), train=False)
            else:
                logits = quantized_apply(model, variables, qt, jnp.asarray(mel))
            cls, f1 = grid_metrics(np.asarray(logits), mask)
            cells.append(cls)
            f1s.append(f1)
        return np.concatenate(cells), float(np.mean(f1s))

    report = {}

    for mode in ("float_trained", "qat_trained"):
        over = list(base_over)
        if mode == "qat_trained":
            over.append("train.qat=true")
        mcfg = parse_overrides(Config(), over)
        state, hist = train_model(
            mcfg, train_c, test_c, workdir=root / f"ckpt_{mode}"
        )
        variables = state.variables()
        log(f"[{mode}] trained: final train loss {hist['train_losses'][-1]:.5f}")

        calib = [b[0] for b in batches[:1]]
        float_cells, float_f1 = evaluate(variables)
        qt = quantize_model(model, variables, calib)
        ptq_cells, ptq_f1 = evaluate(variables, qt)
        qt_w8 = quantize_model(model, variables, calib, weight_only=True)
        w8_cells, w8_f1 = evaluate(variables, qt_w8)

        report[mode] = {
            "float_frame_f1": round(float_f1, 4),
            "ptq_frame_f1": round(ptq_f1, 4),
            "weight_only_frame_f1": round(w8_f1, 4),
            "ptq_argmax_agreement_vs_float": round(
                float((ptq_cells == float_cells).mean()), 5
            ),
            "weight_only_argmax_agreement_vs_float": round(
                float((w8_cells == float_cells).mean()), 5
            ),
        }
        log(f"[{mode}] {report[mode]}")
        print(json.dumps({mode: report[mode]}), flush=True)

    RESULTS.mkdir(exist_ok=True)
    (RESULTS / "int8_accuracy.json").write_text(
        json.dumps(report, indent=2) + "\n"
    )


if __name__ == "__main__":
    main()
