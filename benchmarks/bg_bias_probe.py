"""Is a tunable background-logit bias worth wiring into decoding?

Grid decoding is per-cell argmax over classes (reference parity,
ref trainer.py:541-556). A standard SELD post-hoc calibration is to
penalize the background class by a scalar bias b (argmax over
[logits_events, logit_bg - b]) tuned on validation: weighted CE trains
toward a likelihood the argmax decision rule doesn't have to be the
optimum of, so the detection operating point is tunable without
retraining.

This probe measures the value of that lever before any product wiring:
train the small-CRNN recipe (the tta_swa_accuracy setup on the dense
event_rate_hz corpus) on CPU, sweep b over a grid, and record every
DCASE2022 metric per b on val AND on a held-out second test set (to
show the tuned b transfers). Output:
benchmarks/results/bg_bias_probe.json.
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
jax.config.update("jax_compilation_cache_dir", str(REPO / "tests/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = REPO / "benchmarks" / "results"

BIASES = [-1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0, 3.0]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def decode_with_bias(logits, bias: float):
    """Class-major (B, T, M, G) logits -> int8 argmax grid with the
    background logit (class M-1) reduced by `bias`."""
    import numpy as np

    lg = np.array(logits, np.float32)
    lg[..., -1, :] -= np.float32(bias)
    return np.argmax(lg, axis=-2).astype(np.int8)


def main():
    import numpy as np

    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.eval.metrics import dcase2022_metrics
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model
    from seld_tpu.train import train_model
    from seld_tpu.train.checkpoint import CheckpointManager
    from seld_tpu.train.optimizer import make_optimizer
    from seld_tpu.train.state import create_train_state

    import atexit
    import shutil

    tmp = Path(tempfile.mkdtemp(prefix="bg_bias_"))
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    cfg = parse_overrides(Config(), [
        "features.feature_set=mel_iv",
        "model.model_type=crnn",
        "model.crnn_cnn_channels=16,32",
        "model.crnn_rnn_hidden=64",
        "model.crnn_rnn_layers=1",
        "model.compute_dtype=float32",
        "window.window_seconds=2.0",
        "window.hop_seconds=1.0",
        "train.batch_size=8",
        "train.num_epochs=40",
        "train.patience=40",
        "train.acs_augment=true",
        "loss.loss_type=ce",
        f"data.base_path={tmp}",
    ])
    rate = 0.4
    train_c = synthetic_corpus(cfg, n_files=8, seconds=60.0, seed=0,
                               doa_step_deg=45, event_rate_hz=rate)
    val_c = synthetic_corpus(cfg, n_files=2, seconds=60.0, seed=100,
                             train=False, doa_step_deg=45, event_rate_hz=rate)
    test_c = synthetic_corpus(cfg, n_files=2, seconds=60.0, seed=200,
                              train=False, doa_step_deg=45, event_rate_hz=rate)
    log(f"corpus: {len(train_c)} train / {len(val_c)} val / {len(test_c)} test")

    train_model(cfg, train_c, val_c, workdir=tmp / "ckpt")

    # load the best checkpoint the way evaluate_model does
    import jax.numpy as jnp

    model = build_model(cfg.model, cfg.grid)
    optimizer = make_optimizer(cfg.train.learning_rate,
                               cfg.train.weight_decay)
    win = val_c.window_frames
    sample = jnp.zeros((cfg.train.batch_size, win, val_c.mel.shape[1],
                        cfg.model.n_mels), jnp.float32)
    template = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                                  sample)
    ckpt = CheckpointManager(tmp / "ckpt", cfg)
    state, meta = ckpt.restore_best(template)
    ckpt.close()
    log(f"loaded best epoch {meta['epoch']}")

    fwd = jax.jit(lambda mel: model.apply(state.variables(), mel, train=False))

    def logits_and_truth(corpus):
        bs = cfg.train.batch_size
        logits, trues = [], []
        for i in range(0, len(corpus), bs):
            idx = np.arange(i, min(i + bs, len(corpus)))
            mel, mask = corpus.gather(idx)
            pad = bs - len(idx)
            if pad:
                # zeros_like(mel[:pad]) under-pads when the tail has
                # fewer than `pad` rows — build the pad shape explicitly
                mel = np.concatenate(
                    [mel, np.zeros((pad, *mel.shape[1:]), mel.dtype)]
                )
            out = np.asarray(fwd(jnp.asarray(mel)))[:len(idx)]
            logits.append(out)
            trues.append(mask)
        return np.concatenate(logits), np.concatenate(trues)

    results = {"train_windows": len(train_c), "epochs": meta["epoch"],
               "biases": {}}
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)  # noqa: F841 (arch parity only)
    for split, corpus in [("val", val_c), ("test", test_c)]:
        lg, true_mask = logits_and_truth(corpus)
        # ground truth: bitmask -> argmax grid (lowest set bit, else bg)
        from seld_tpu.losses.seld_loss import _bit_labels

        true_cls = np.asarray(_bit_labels(jnp.asarray(true_mask),
                                          cfg.grid.num_classes), np.int8)
        for b in BIASES:
            pred = decode_with_bias(lg, b)
            m = dcase2022_metrics(pred, true_cls, cfg.grid.n_el,
                                  cfg.grid.n_az, cfg.grid.num_classes)
            row = {k: round(float(m[k]), 4)
                   for k in ("ER", "F_macro", "LE_macro", "LR_macro",
                             "SELD_error")}
            results["biases"].setdefault(str(b), {})[split] = row
            log(f"{split} bias={b}: {json.dumps(row)}")

    RESULTS.mkdir(exist_ok=True)
    (RESULTS / "bg_bias_probe.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
