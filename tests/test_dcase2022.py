"""Golden tests for the official DCASE2022 SELD metrics
(seld_tpu/eval/metrics.py::dcase2022_metrics).

Every case is hand-computable: grids are 18x36 with 10 deg cells, cell
centers at el = -85 + 10*i, az = -175 + 10*j, flattened index i*36 + j.
Segments are 50 frames (1 s at 50 fps).
"""

import itertools

import numpy as np
import pytest

from seld_tpu.eval.metrics import (
    _angular_distance_deg,
    dcase2022_metrics,
    grid_to_frame_doas,
)

BG = 13
N_EL, N_AZ, G = 18, 36, 18 * 36


def cell(el_deg, az_deg):
    i = int((el_deg + 85) / 10)
    j = int((az_deg + 175) / 10)
    return i * N_AZ + j


def empty(n_frames=50):
    return np.full((1, n_frames, G), BG, np.int8)


def dist_deg(el1, az1, el2, az2):
    return float(
        _angular_distance_deg(
            np.deg2rad(el1), np.deg2rad(az1), np.deg2rad(el2), np.deg2rad(az2)
        )
    )


def test_grid_to_frame_doas():
    g = empty(2)
    g[0, 0, cell(5, 5)] = 2
    g[0, 0, cell(45, -175)] = 2
    g[0, 1, cell(-85, 175)] = 7
    frames = grid_to_frame_doas(g, N_EL, N_AZ, 14)
    assert len(frames) == 2
    assert set(frames[0].keys()) == {2}
    doas = frames[0][2]
    assert doas.shape == (2, 2)
    assert sorted(map(tuple, doas.tolist())) == [(5.0, 5.0), (45.0, -175.0)]
    assert frames[1] == {7: pytest.approx(np.array([[-85.0, 175.0]]))} or (
        frames[1][7].tolist() == [[-85.0, 175.0]]
    )


def test_perfect_prediction():
    gt = empty()
    gt[0, 0:25, cell(5, 5)] = 2
    m = dcase2022_metrics(gt, gt)
    assert m["ER"] == 0.0
    assert m["F_macro"] == pytest.approx(1.0)
    assert m["LE_macro"] == pytest.approx(0.0, abs=1e-9)
    assert m["LR_macro"] == pytest.approx(1.0)
    assert m["SELD_error"] == pytest.approx(0.0, abs=1e-9)
    assert m["Nref"] == 1 and m["TP"] == 1


def test_complete_miss():
    gt = empty()
    gt[0, 0:25, cell(5, 5)] = 2
    m = dcase2022_metrics(empty(), gt)
    # one GT segment-class, never predicted: deletion
    assert (m["S"], m["D"], m["I"]) == (0, 1, 0)
    assert m["ER"] == 1.0
    assert m["F_macro"] == pytest.approx(0.0)
    assert m["LR_macro"] == pytest.approx(0.0)
    assert m["LE_macro"] == pytest.approx(180.0)  # never-detected convention
    assert m["SELD_error"] == pytest.approx(1.0)


def test_spurious_class_is_insertion():
    gt = empty()
    gt[0, 0:25, cell(5, 5)] = 2
    pred = gt.copy()
    pred[0, 0:5, cell(-85, -175)] = 5  # extra class never in GT
    m = dcase2022_metrics(pred, gt)
    assert (m["S"], m["D"], m["I"]) == (0, 0, 1)
    assert m["ER"] == 1.0  # 1 insertion / 1 reference
    # macro averages over GT classes only -> the spurious class (Nref=0)
    # does not drag F_macro down; micro pools it
    assert m["F_macro"] == pytest.approx(1.0)
    assert m["F_micro"] == pytest.approx(1.0 / (1.0 + 0.5), rel=1e-6)


def test_dateline_wraparound_within_threshold():
    gt = empty()
    pred = empty()
    gt[0, 0:10, cell(5, -175)] = 2
    pred[0, 0:10, cell(5, 175)] = 2  # 350 deg apart in az = ~10 deg great-circle
    d = dist_deg(5, -175, 5, 175)
    assert d < 20.0
    m = dcase2022_metrics(pred, gt)
    assert m["TP"] == 1 and m["ER"] == 0.0
    assert m["LE_macro"] == pytest.approx(d, rel=1e-6)


def test_mislocalized_beyond_threshold_is_spatial_fp():
    gt = empty()
    pred = empty()
    gt[0, 0:10, cell(5, 5)] = 2
    pred[0, 0:10, cell(5, 65)] = 2  # ~60 deg away
    d = dist_deg(5, 5, 5, 65)
    assert d > 20.0
    m = dcase2022_metrics(pred, gt)
    # detected (LR=1) but mislocalized: no TP, spatial FP -> insertion
    assert m["TP"] == 0 and m["FP_spatial"] == 1
    assert (m["S"], m["D"], m["I"]) == (0, 0, 1)
    assert m["ER"] == 1.0
    assert m["F_macro"] == pytest.approx(0.0)
    assert m["LR_macro"] == pytest.approx(1.0)
    assert m["LE_macro"] == pytest.approx(d, rel=1e-6)


def test_hungarian_two_sources():
    """Two simultaneous same-class sources: per-frame DOA alignment must be
    the min-cost one-to-one assignment. Oracle: literal brute force over
    permutations."""
    gt = empty()
    pred = empty()
    gt_cells = [(5, 5), (5, 45)]
    pr_cells = [(5, 15), (5, 55)]
    for el, az in gt_cells:
        gt[0, 0:10, cell(el, az)] = 2
    for el, az in pr_cells:
        pred[0, 0:10, cell(el, az)] = 2

    # brute-force min over assignments of the mean pair distance
    best = min(
        np.mean([dist_deg(*g, *p) for g, p in zip(gt_cells, perm)])
        for perm in itertools.permutations(pr_cells)
    )
    assert best < 20.0
    m = dcase2022_metrics(pred, gt)
    assert m["TP"] == 1
    assert m["LE_macro"] == pytest.approx(best, rel=1e-6)


def test_same_segment_disjoint_frames_is_miss():
    gt = empty()
    pred = empty()
    gt[0, 0:10, cell(5, 5)] = 2
    pred[0, 40:50, cell(5, 5)] = 2  # same segment, no shared frame
    m = dcase2022_metrics(pred, gt)
    assert m["TP"] == 0 and m["FN"] == 1
    assert m["ER"] == 1.0
    assert m["LR_macro"] == pytest.approx(0.0)
    assert m["LE_macro"] == pytest.approx(180.0)


def test_two_segments_half_detected():
    gt = empty(100)
    pred = empty(100)
    gt[0, 0:50, cell(5, 5)] = 2
    gt[0, 50:100, cell(5, 5)] = 2
    pred[0, 0:50, cell(5, 5)] = 2  # segment 2 missed
    m = dcase2022_metrics(pred, gt)
    assert m["Nref"] == 2 and m["TP"] == 1 and m["FN"] == 1
    assert m["ER"] == pytest.approx(0.5)
    assert m["LR_macro"] == pytest.approx(0.5)
    assert m["F_macro"] == pytest.approx(1.0 / (1.0 + 0.5), rel=1e-6)
    assert m["LE_macro"] == pytest.approx(0.0, abs=1e-9)


def test_substitution():
    """Predicting the wrong class where a GT class exists is one
    substitution (S=1), not D+I=2 ... in ER terms S=min(FP,FN)."""
    gt = empty()
    pred = empty()
    gt[0, 0:10, cell(5, 5)] = 2
    pred[0, 0:10, cell(5, 5)] = 7
    m = dcase2022_metrics(pred, gt)
    assert (m["S"], m["D"], m["I"]) == (1, 0, 0)
    assert m["ER"] == 1.0


def test_multi_window_input_shapes():
    """(N, T, G) batched windows flatten consistently."""
    gt = np.full((3, 50, G), BG, np.int8)
    gt[1, 0:25, cell(5, 5)] = 2
    m = dcase2022_metrics(gt, gt)
    assert m["ER"] == 0.0 and m["Nref"] == 1
