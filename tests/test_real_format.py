"""End-to-end integration over STARSS22-format fixture files (VERDICT
round-1 item 7): realistic multi-source / dateline / pole events written
as real WAV+CSV trees and driven through the REAL (non-synthetic) CLI
path — discovery -> rasterize -> train -> eval -> predict — plus the
metadata CSV round-trip through infer.Prediction.to_metadata_rows.

Reference semantics exercised: dataset.py:60-119 (5x metadata fanout,
multi-row frames, background fill), dataset.py:121-165 (Sony+TAU split
pairing), utils.py:77-90 (polar_to_grid boundary clipping).
"""

import numpy as np
import pytest

from seld_tpu.config import Config, parse_overrides
from seld_tpu.data.discovery import discover_files
from seld_tpu.data.synthetic import starss_fixture
from seld_tpu.grid import polar_to_grid
from seld_tpu.targets.rasterize import (
    bitmask_to_dense,
    encode_events_to_bitmask,
    load_metadata_csv,
)

TINY = [
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
]


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("starss")
    cfg = parse_overrides(Config(), [f"data.base_path={root}"])
    files = starss_fixture(root, cfg, seconds=6.0, seed=0)
    return root, cfg, files


def test_discovery_pairs_sony_and_tau(fixture_tree):
    root, cfg, files = fixture_tree
    tr_a, tr_m, te_a, te_m = discover_files(cfg.data)
    assert tr_a == files["train"][0] and tr_m == files["train"][1]
    assert te_a == files["test"][0] and te_m == files["test"][1]
    assert len(tr_a) == 2  # one sony + one tau
    assert "dev-train-sony" in tr_a[0] and "dev-train-tau" in tr_a[1]
    for a, m in zip(tr_a + te_a, tr_m + te_m):
        assert a.replace(".wav", ".csv").replace(
            cfg.data.audio_dirname, cfg.data.metadata_dirname
        ) == m


def test_rasterizer_on_fixture_semantics(fixture_tree):
    """The fixture's corner cases land where the reference's scalar loops
    would put them: dateline +-180 clip to the east/west edge columns,
    poles clip to the top/bottom rows, and two same-frame sources of one
    class produce two distinct active cells."""
    root, cfg, files = fixture_tree
    fr, cl, _src, az, el = load_metadata_csv(files["train"][1][0])
    n_frames = int(6.0 * 50)
    mask = encode_events_to_bitmask(
        fr, cl, az, el, n_frames, cfg.grid.n_el, cfg.grid.n_az
    )  # (T, G) uint16 bitmask
    dense = bitmask_to_dense(mask, cfg.grid.num_classes)
    cls_map = np.argmax(dense, -1)

    # frame 0 (meta frame 0, fans out to label frames 0..4): class 2 at
    # az=+180 and az=-180 simultaneously -> two distinct cells active
    i_e, j_e = polar_to_grid(180.0, 30.0, cfg.grid.n_el, cfg.grid.n_az)
    i_w, j_w = polar_to_grid(-180.0, -30.0, cfg.grid.n_el, cfg.grid.n_az)
    assert j_e == cfg.grid.n_az - 1  # +180 clips to the last azimuth column
    assert j_w == 0
    for lf in range(5):
        assert dense[lf, i_e * cfg.grid.n_az + j_e, 2] == 1
        assert dense[lf, i_w * cfg.grid.n_az + j_w, 2] == 1

    # pole elevation: el=+90 clips to the top row
    i_p, j_p = polar_to_grid(-90.0, 90.0, cfg.grid.n_el, cfg.grid.n_az)
    assert i_p == cfg.grid.n_el - 1
    assert dense[5 * 5, i_p * cfg.grid.n_az + j_p, 7] == 1  # meta frame 5

    # overlap: label frame 25 (meta 5) has class 2 AND class 7 active
    active_classes = set(np.nonzero(dense[25].sum(0) > 0)[0]) - {13}
    assert {2, 7} <= active_classes

    # untouched cells carry background
    assert (dense[..., 13] == 1 - (dense[..., :13].max(-1))).all()
    assert cls_map.shape == (n_frames, cfg.grid.n_cells)


def test_cli_train_eval_predict_on_real_files(fixture_tree, tmp_path):
    """Full user journey over real-format files: train --eval-after on the
    discovered corpus, then predict on a fixture WAV and round-trip the
    emitted CSV through the rasterizer."""
    from seld_tpu.cli import main

    root, cfg, files = fixture_tree
    over = [f"data.base_path={root}", *TINY]

    assert main(["train", "--eval-after", *over]) == 0
    assert (root / "checkpoints" / "best").exists()
    assert (root / "outputs" / "loss_curves.png").exists()
    assert (root / "checkpoints" / "metrics.jsonl").exists()

    wav = files["test"][0][0]
    assert main(["predict", *over, "--wavs", wav]) == 0
    import pathlib

    csv_out = root / "outputs" / "predictions" / (
        pathlib.Path(wav).stem + ".csv"
    )
    assert csv_out.exists()
    content = csv_out.read_text().strip()
    if content:  # undertrained models may emit nothing — format still holds
        rows = np.loadtxt(csv_out, np.int64, delimiter=",").reshape(-1, 5)
        assert (rows[:, 1] >= 0).all() and (rows[:, 1] < 13).all()
        assert (rows[:, 3] >= -180).all() and (rows[:, 3] <= 180).all()
        assert (rows[:, 4] >= -90).all() and (rows[:, 4] <= 90).all()


def test_prediction_metadata_roundtrip(fixture_tree):
    """Prediction.to_metadata_rows is the inverse of the rasterizer's 5x
    fanout: rasterize fixture rows -> argmax class grids -> collapse back
    to metadata rows -> the original (frame, class, cell) triples survive
    (azimuth/elevation at cell-center resolution)."""
    from seld_tpu.infer import Prediction

    root, cfg, files = fixture_tree
    rows = np.loadtxt(files["test"][1][0], np.int64, delimiter=",")
    fr, cl, _src, az_a, el_a = load_metadata_csv(files["test"][1][0])
    n_frames = int(6.0 * 50)
    mask = encode_events_to_bitmask(
        fr, cl, az_a, el_a, n_frames, cfg.grid.n_el, cfg.grid.n_az
    )
    dense = bitmask_to_dense(mask, cfg.grid.num_classes)
    classes = np.argmax(dense, -1).astype(np.int8)

    pred = Prediction(
        classes=classes, n_el=cfg.grid.n_el, n_az=cfg.grid.n_az,
        num_classes=cfg.grid.num_classes,
    )
    got = pred.to_metadata_rows(min_votes=3)

    def key_set(r):
        out = set()
        for mf, cls, _src, az, el in np.asarray(r).tolist():
            i, j = polar_to_grid(az, el, cfg.grid.n_el, cfg.grid.n_az)
            out.add((int(mf), int(cls), int(i), int(j)))
        return out

    want = key_set(rows)
    have = key_set(got)
    # Cells where two classes collide in one cell can lose the argmax tie;
    # the fixture avoids same-cell collisions, so the sets must match.
    assert want == have
