"""Quickstart: the notebook-style end-to-end walkthrough as a script.

Mirrors the reference notebook's quick test (ref SMR_SELD_2.ipynb cell 37:
tiny dataset -> forward pass -> all loss components -> short training) on
synthetic data, then runs inference. Runs on CPU or TPU.

  python examples/quickstart.py
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.config import Config, parse_overrides
from seld_tpu.data import synthetic_corpus
from seld_tpu.data.synthetic import synthetic_raw_files
from seld_tpu.eval import evaluate_model
from seld_tpu.infer import SELDPredictor
from seld_tpu.losses import SELDLossFn
from seld_tpu.models import build_model, init_variables
from seld_tpu.targets.rasterize import decode_class_bitmask
from seld_tpu.train import train_model
from seld_tpu.utils import setup_logging


def main():
    logger, _ = setup_logging(experiment_name="quickstart")
    workdir = Path(tempfile.mkdtemp(prefix="seld_quickstart_"))
    cfg = parse_overrides(
        Config(),
        [
            "model.model_type=crnn",
            "model.crnn_cnn_channels=16,32",
            "model.crnn_rnn_hidden=32",
            "model.crnn_rnn_layers=1",
            "window.window_seconds=1.0",
            "window.hop_seconds=0.5",
            "train.batch_size=4",
            "train.num_epochs=2",
            "train.save_every_n_epochs=1",
            "loss.use_aiur=true",
            "loss.use_cl=true",
            f"data.base_path={workdir}",
        ],
    )

    # 1) data: two synthetic FOA clips with event metadata
    train_c = synthetic_corpus(cfg, n_files=2, seconds=6.0, seed=0, train=True)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=1, train=False)
    logger.info("train windows: %d, test windows: %d", len(train_c), len(test_c))

    # 2) one forward pass + every loss component (notebook cell-37 style)
    model = build_model(cfg.model, cfg.grid)
    mel, mask = train_c.gather(np.arange(cfg.train.batch_size))
    variables = init_variables(model, jax.random.PRNGKey(0), jnp.asarray(mel))
    logits = model.apply(variables, jnp.asarray(mel), train=False)
    targets = decode_class_bitmask(
        jnp.asarray(mask), cfg.grid.num_classes, class_major=True
    )  # dense targets in the repo's class-major (B, T, M, G) layout
    total, breakdown = SELDLossFn(cfg.loss, cfg.grid)(logits, targets)
    logger.info(
        "untrained losses: total %.4f | %s",
        float(total),
        {k: round(float(v), 4) for k, v in breakdown.items()},
    )

    # 3) short training run with checkpoints
    state, history = train_model(cfg, train_c, test_c, workdir=workdir / "ckpt")

    # 4) evaluation: accuracies + DCASE metrics + PNGs
    results = evaluate_model(cfg, test_c, workdir / "ckpt", num_visualizations=2)
    logger.info(
        "eval: loss %.4f | overall acc %.2f%% | ER %.3f F %.3f",
        results["test_loss"], results["overall_accuracy"],
        results["dcase"]["ER"], results["dcase"]["F"],
    )

    # 5) serving: WAV in -> event CSV out
    wavs, _ = synthetic_raw_files(workdir / "wav", cfg, n_files=1, seconds=3.0)
    predictor = SELDPredictor(workdir / "ckpt")
    pred = predictor.predict_file(wavs[0], csv_out=workdir / "pred.csv")
    logger.info(
        "inference: %d frames, %d active cells, CSV at %s",
        pred.classes.shape[0], len(pred.events()), workdir / "pred.csv",
    )
    logger.info("artifacts under %s", workdir)


if __name__ == "__main__":
    main()
