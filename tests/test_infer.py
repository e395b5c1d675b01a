"""Inference/serving tests: checkpoint-backed prediction over a WAV file
and metadata round-trip."""

import numpy as np

from seld_tpu.data import synthetic_corpus
from seld_tpu.data.synthetic import synthetic_raw_files
from seld_tpu.infer import Prediction, SELDPredictor
from seld_tpu.train import train_model
from tests.test_train import tiny_config


def test_prediction_event_decoding():
    classes = np.full((10, 648), 13, np.int8)
    classes[2, 100] = 5  # one active cell in one frame
    pred = Prediction(classes=classes, n_el=18, n_az=36, num_classes=14)
    ev = pred.events()
    assert len(ev) == 1
    frame, cls, az, el = ev[0]
    assert (frame, cls) == (2, 5)
    i, j = divmod(100, 36)
    assert el == int(round(-90 + (i + 0.5) * 10))
    assert az == int(round(-180 + (j + 0.5) * 10))


def test_metadata_rows_majority_vote():
    classes = np.full((10, 648), 13, np.int8)
    classes[0:3, 50] = 4  # 3 of 5 frames in metadata frame 0 -> emitted
    classes[5:7, 60] = 2  # 2 of 5 frames in metadata frame 1 -> dropped
    pred = Prediction(classes=classes, n_el=18, n_az=36, num_classes=14)
    rows = pred.to_metadata_rows(min_votes=3)
    assert rows.shape == (1, 5)
    assert rows[0][0] == 0 and rows[0][1] == 4


def test_predictor_overlapped_windows(tmp_path):
    cfg = tiny_config(tmp_path)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    predictor = SELDPredictor(tmp_path / "ckpt", batch_windows=2)
    audio_files, _ = synthetic_raw_files(tmp_path / "wav", cfg, n_files=1, seconds=2.3)
    from seld_tpu.data.audio import load_wav

    wave, _ = load_wav(audio_files[0])
    p0 = predictor.predict_waveform(wave, overlap=0.0)
    p1 = predictor.predict_waveform(wave, overlap=0.5)
    assert p0.classes.shape == p1.classes.shape
    # averaged predictions should agree with tiled ones on most frames
    agreement = (p0.classes == p1.classes).mean()
    assert agreement > 0.8


def test_predictor_with_spatial_features(tmp_path):
    # checkpoint trained on mel_iv features -> predictor derives 7 input
    # channels from the stored config
    cfg = tiny_config(tmp_path).replace_path("features.feature_set", "mel_iv")
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    predictor = SELDPredictor(tmp_path / "ckpt", batch_windows=2)
    assert predictor.cfg.features.feature_set == "mel_iv"
    audio_files, _ = synthetic_raw_files(tmp_path / "wav", cfg, n_files=1, seconds=2.0)
    pred = predictor.predict_file(audio_files[0])
    assert pred.classes.shape[1] == 648


def test_predictor_end_to_end(tmp_path):
    cfg = tiny_config(tmp_path)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")

    predictor = SELDPredictor(tmp_path / "ckpt", batch_windows=2)
    # the stored checkpoint config drives the architecture
    assert predictor.cfg.model.model_type == "crnn"

    audio_files, _ = synthetic_raw_files(tmp_path / "wav", cfg, n_files=1, seconds=2.5)
    pred = predictor.predict_file(audio_files[0], csv_out=tmp_path / "out.csv")
    # 2.5 s at 50 fps -> 125 label frames (mel gives 126, cropped by window tiling)
    assert pred.classes.shape[1] == 648
    assert abs(pred.classes.shape[0] - 126) <= 1
    assert (tmp_path / "out.csv").exists()
