"""Serving walkthrough: every deployment path on one tiny checkpoint.

The reference has no serving story at all (prediction exists only inside
its evaluation loop, ref trainer.py:394-711). This example trains a tiny
model on synthetic data, then demonstrates:

  1. batch file prediction  -> STARSS22-format event CSV
  2. overlapped-window probability averaging (smoother boundaries)
  3. streaming inference    -> O(window) memory, bit-equal to offline
  4. AOT export             -> self-contained StableHLO artifact that
                               loads and runs WITHOUT seld_tpu model code

  python examples/serving.py
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np

from seld_tpu.config import Config, parse_overrides
from seld_tpu.data import synthetic_corpus
from seld_tpu.data.synthetic import synthetic_raw_files
from seld_tpu.export import export_serving, load_serving
from seld_tpu.infer import SELDPredictor
from seld_tpu.stream import StreamingSession, stream_predict
from seld_tpu.train import train_model
from seld_tpu.utils import setup_logging


def main():
    logger, _ = setup_logging(experiment_name="serving_example")
    root = Path(tempfile.mkdtemp(prefix="seld_serving_"))

    cfg = parse_overrides(Config(), [
        "model.model_type=crnn",
        "model.crnn_cnn_channels=8,16",
        "model.crnn_rnn_hidden=16",
        "model.crnn_rnn_layers=1",
        "model.compute_dtype=float32",
        "window.window_seconds=1.0",
        "window.hop_seconds=0.5",
        "train.batch_size=4",
        "train.num_epochs=2",
        "train.save_every_n_epochs=1",
        f"data.base_path={root}",
    ])

    # -- train a tiny checkpoint --------------------------------------------
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=root / "checkpoints")

    predictor = SELDPredictor(root / "checkpoints")
    wavs, _ = synthetic_raw_files(root / "wav", cfg, n_files=1, seconds=6.0)

    # -- 1. batch file prediction -------------------------------------------
    pred = predictor.predict_file(wavs[0], csv_out=root / "pred.csv")
    logger.info("file predict: %d frames -> %s", pred.classes.shape[0],
                root / "pred.csv")

    # -- 2. overlapped-window averaging --------------------------------------
    pred_ov = predictor.predict_file(wavs[0], overlap=0.5)
    agree = float((pred_ov.classes == pred.classes).mean())
    logger.info("overlap=0.5 predict: %.1f%% agreement with tiled", 100 * agree)

    # -- 3. streaming (live-capture style: 0.25 s chunks) ---------------------
    from seld_tpu.data.audio import load_wav

    wave, _sr = load_wav(wavs[0])
    session = StreamingSession(predictor)
    n_frags = 0
    for start in range(0, wave.shape[1], 6000):
        n_frags += len(session.push(wave[:, start : start + 6000]))
    n_frags += len(session.flush())
    logger.info("streaming: %d window fragments emitted incrementally", n_frags)
    streamed = stream_predict(
        predictor, [wave[:, i : i + 6000] for i in range(0, wave.shape[1], 6000)]
    )
    assert np.array_equal(streamed.classes, pred.classes), "stream != offline"
    logger.info("streaming output is bit-identical to offline prediction")

    # streaming composes with overlapped averaging, still bit-equal
    streamed_ov = stream_predict(
        predictor,
        [wave[:, i : i + 6000] for i in range(0, wave.shape[1], 6000)],
        overlap=0.5,
    )
    assert np.array_equal(streamed_ov.classes, pred_ov.classes)
    logger.info("streamed overlap=0.5 matches offline overlapped prediction")

    # -- 4. int8 PTQ serving (self-calibrated; 1.33x measured on chip) --------
    p_int8 = SELDPredictor(root / "checkpoints")
    p_int8.quantize(calib_waves=[wave])
    pred_q = p_int8.predict_file(wavs[0])
    agree = float((pred_q.classes == pred.classes).mean())
    logger.info("int8 PTQ predict: %.1f%% cell agreement with float", 100 * agree)
    st_q = stream_predict(
        p_int8, [wave[:, i : i + 6000] for i in range(0, wave.shape[1], 6000)]
    )
    assert np.array_equal(st_q.classes, pred_q.classes)
    logger.info("int8 streaming stays bit-equal to int8 offline")

    # -- 5. AOT export ---------------------------------------------------------
    artifact = export_serving(root / "checkpoints", root / "model.stablehlo",
                              batch_windows=2)
    fn, meta = load_serving(artifact)
    mel = np.zeros(meta["input_shape"], np.float32)
    grid = np.asarray(fn(mel))
    logger.info("exported artifact runs standalone: %s -> %s %s",
                meta["input_shape"], grid.shape, grid.dtype)
    logger.info("artifacts under %s", root)


if __name__ == "__main__":
    main()
