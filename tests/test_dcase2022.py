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
    m = dcase2022_metrics(gt, gt, macro_over="gt")
    assert m["ER"] == 0.0
    assert m["F_macro"] == pytest.approx(1.0)
    assert m["LE_macro"] == pytest.approx(0.0, abs=1e-9)
    assert m["LR_macro"] == pytest.approx(1.0)
    assert m["SELD_error"] == pytest.approx(0.0, abs=1e-9)
    assert m["Nref"] == 1 and m["TP"] == 1
    # official macro (macro_over="all", the default) averages over ALL 13
    # scored classes: the 12 absent ones contribute F=0 / LE=180 / LR=0.
    mo = dcase2022_metrics(gt, gt)
    assert mo["F_macro"] == pytest.approx(1.0 / 13)
    assert mo["LE_macro"] == pytest.approx(12 * 180.0 / 13)
    assert mo["LR_macro"] == pytest.approx(1.0 / 13)
    assert mo["ER"] == 0.0 and mo["TP"] == 1


def test_complete_miss():
    gt = empty()
    gt[0, 0:25, cell(5, 5)] = 2
    m = dcase2022_metrics(empty(), gt)
    # one GT segment-class, never predicted: deletion
    assert (m["S"], m["D"], m["I"]) == (0, 1, 0)
    assert m["ER"] == pytest.approx(1.0)
    assert m["F_macro"] == pytest.approx(0.0)
    assert m["LR_macro"] == pytest.approx(0.0)
    assert m["LE_macro"] == pytest.approx(180.0)  # never-detected convention
    assert m["SELD_error"] == pytest.approx(1.0)


def test_spurious_class_is_insertion():
    gt = empty()
    gt[0, 0:25, cell(5, 5)] = 2
    pred = gt.copy()
    pred[0, 0:5, cell(-85, -175)] = 5  # extra class never in GT
    m = dcase2022_metrics(pred, gt, macro_over="gt")
    assert (m["S"], m["D"], m["I"]) == (0, 0, 1)
    assert m["ER"] == pytest.approx(1.0)  # 1 insertion / 1 reference
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
    m = dcase2022_metrics(pred, gt, macro_over="gt")
    assert m["TP"] == 1 and m["ER"] == 0.0
    assert m["LE_macro"] == pytest.approx(d, rel=1e-6)


def test_mislocalized_beyond_threshold_is_spatial_fp():
    gt = empty()
    pred = empty()
    gt[0, 0:10, cell(5, 5)] = 2
    pred[0, 0:10, cell(5, 65)] = 2  # ~60 deg away
    d = dist_deg(5, 5, 5, 65)
    assert d > 20.0
    m = dcase2022_metrics(pred, gt, macro_over="gt")
    # detected (LR=1) but mislocalized: no TP, spatial FP -> insertion
    assert m["TP"] == 0 and m["FP_spatial"] == 1
    assert (m["S"], m["D"], m["I"]) == (0, 0, 1)
    assert m["ER"] == pytest.approx(1.0)
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
    m = dcase2022_metrics(pred, gt, macro_over="gt")
    # Official multi-track bookkeeping: each matched GT row ("track") gets
    # its own decision -> 2 TPs against Nref=1 (the official code's
    # documented quirk); LE is the mean of the per-track averages, which
    # equals the min-cost mean pair distance here (both tracks constant
    # over frames).
    assert m["TP"] == 2 and m["Nref"] == 1
    assert m["LR_macro"] == pytest.approx(1.0)
    assert m["LE_macro"] == pytest.approx(best, rel=1e-6)


def test_same_segment_disjoint_frames_is_miss():
    gt = empty()
    pred = empty()
    gt[0, 0:10, cell(5, 5)] = 2
    pred[0, 40:50, cell(5, 5)] = 2  # same segment, no shared frame
    m = dcase2022_metrics(pred, gt)
    assert m["TP"] == 0 and m["FN"] == 1
    assert m["ER"] == pytest.approx(1.0)
    assert m["LR_macro"] == pytest.approx(0.0)
    assert m["LE_macro"] == pytest.approx(180.0)


def test_two_segments_half_detected():
    gt = empty(100)
    pred = empty(100)
    gt[0, 0:50, cell(5, 5)] = 2
    gt[0, 50:100, cell(5, 5)] = 2
    pred[0, 0:50, cell(5, 5)] = 2  # segment 2 missed
    m = dcase2022_metrics(pred, gt, macro_over="gt")
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
    assert m["ER"] == pytest.approx(1.0)


def test_multi_window_input_shapes():
    """(N, T, G) batched windows flatten consistently."""
    gt = np.full((3, 50, G), BG, np.int8)
    gt[1, 0:25, cell(5, 5)] = 2
    m = dcase2022_metrics(gt, gt)
    assert m["ER"] == 0.0 and m["Nref"] == 1


# ---------------------------------------------------------------------------
# Independent oracle: a literal from-scratch restatement of the official
# DCASE2022 SELDMetrics (seld-dcase2022 SELD_evaluation_metrics.py:
# update_seld_scores / compute_seld_scores with the multi-track extension),
# never importing the implementation under test. Structured exactly like
# the official code: per-segment dicts, per-frame DOA lists, per-frame
# Hungarian, matched distances pooled by GT row index ("track"), and the
# official eps-based score formulas.
# ---------------------------------------------------------------------------

NB_CLASSES = 13  # scored classes (background BG=13 never scored)
FPS = 50


def _oracle_distance_matrix(gt_doas_deg, pred_doas_deg):
    """Great-circle distances in degrees, restating the official
    distance_between_spherical_coordinates_rad formula."""
    g = np.asarray(gt_doas_deg, float) * np.pi / 180.0
    p = np.asarray(pred_doas_deg, float) * np.pi / 180.0
    el1, az1 = g[:, 0][:, None], g[:, 1][:, None]
    el2, az2 = p[:, 0][None, :], p[:, 1][None, :]
    val = (np.sin(el1) * np.sin(el2)
           + np.cos(el1) * np.cos(el2) * np.cos(np.abs(az1 - az2)))
    return np.arccos(np.clip(val, -1.0, 1.0)) * 180.0 / np.pi


def _oracle_frames(grid):
    """grid (F, G) -> per-frame {class: [[el_deg, az_deg], ...]} in
    ascending cell order (the canonical row order for grid outputs)."""
    out = []
    for f in range(grid.shape[0]):
        d = {}
        for c_idx in np.nonzero(grid[f] != BG)[0]:
            el = -85.0 + 10.0 * (c_idx // N_AZ)
            az = -175.0 + 10.0 * (c_idx % N_AZ)
            d.setdefault(int(grid[f, c_idx]), []).append([el, az])
        out.append(d)
    return out


def _oracle_segment_labels(frames):
    """Official segment_labels layout: blocks[b][c] = [[frame_index_list,
    per-frame DOA lists]] for classes active in the segment."""
    n_blocks = -(-len(frames) // FPS)
    blocks = {}
    for b in range(n_blocks):
        blocks[b] = {}
        for c in range(NB_CLASSES):
            ind, doas = [], []
            for fi in range(b * FPS, min((b + 1) * FPS, len(frames))):
                if c in frames[fi]:
                    ind.append(fi - b * FPS)
                    doas.append(frames[fi][c])
            if ind:
                blocks[b][c] = [[ind, doas]]
    return blocks


def oracle_dcase2022(pred_grid, gt_grid, thresh=20.0):
    from scipy.optimize import linear_sum_assignment

    pred_blocks = _oracle_segment_labels(
        _oracle_frames(np.asarray(pred_grid).reshape(-1, G)))
    gt_blocks = _oracle_segment_labels(
        _oracle_frames(np.asarray(gt_grid).reshape(-1, G)))

    TP = np.zeros(NB_CLASSES, int)
    FP = np.zeros(NB_CLASSES, int)
    FP_sp = np.zeros(NB_CLASSES, int)
    FN = np.zeros(NB_CLASSES, int)
    Nref = np.zeros(NB_CLASSES, int)
    total_DE = np.zeros(NB_CLASSES, float)
    DE_TP = np.zeros(NB_CLASSES, int)
    DE_FN = np.zeros(NB_CLASSES, int)
    S = D = I = 0

    for b in range(len(gt_blocks)):
        loc_FN = loc_FP = 0
        for c in range(NB_CLASSES):
            in_gt = c in gt_blocks[b]
            in_pred = c in pred_blocks[b]
            if in_gt:
                Nref[c] += 1
            if in_gt and in_pred:
                matched_track_dist, matched_track_cnt = {}, {}
                gt_ind_list = gt_blocks[b][c][0][0]
                pred_ind_list = pred_blocks[b][c][0][0]
                for gt_i, gt_val in enumerate(gt_ind_list):
                    if gt_val in pred_ind_list:
                        gt_doas = gt_blocks[b][c][0][1][gt_i]
                        pred_doas = pred_blocks[b][c][0][1][
                            pred_ind_list.index(gt_val)]
                        cost = _oracle_distance_matrix(gt_doas, pred_doas)
                        rows, cols = linear_sum_assignment(cost)
                        for r, cc in zip(rows, cols):
                            matched_track_dist.setdefault(int(r), []).append(
                                cost[r, cc])
                            matched_track_cnt.setdefault(int(r), []).append(cc)
                if len(matched_track_dist) == 0:
                    loc_FN += 1
                    FN[c] += 1
                    DE_FN[c] += 1
                else:
                    for tid in matched_track_dist:
                        avg = (sum(matched_track_dist[tid])
                               / len(matched_track_cnt[tid]))
                        total_DE[c] += avg
                        DE_TP[c] += 1
                        if avg <= thresh:
                            TP[c] += 1
                        else:
                            loc_FP += 1
                            FP_sp[c] += 1
            elif in_gt:
                loc_FN += 1
                FN[c] += 1
                DE_FN[c] += 1
            elif in_pred:
                loc_FP += 1
                FP[c] += 1
        S += min(loc_FP, loc_FN)
        D += max(0, loc_FN - loc_FP)
        I += max(0, loc_FP - loc_FN)

    eps = np.finfo(float).eps
    ER = (S + D + I) / (Nref.sum() + eps)
    f_cls = TP / (eps + TP + FP_sp + 0.5 * (FP + FN))
    le_cls = total_DE / (DE_TP + eps)
    le_cls[DE_TP == 0] = 180.0
    lr_cls = DE_TP / (eps + DE_TP + DE_FN)
    return {
        "ER": float(ER),
        "F_macro": float(f_cls.mean()),
        "LE_macro": float(le_cls.mean()),
        "LR_macro": float(lr_cls.mean()),
        "S": S, "D": D, "I": I,
        "Nref": int(Nref.sum()), "TP": int(TP.sum()), "FP": int(FP.sum()),
        "FP_spatial": int(FP_sp.sum()), "FN": int(FN.sum()),
        "f_cls": f_cls, "le_cls": le_cls, "lr_cls": lr_cls,
        "Nref_cls": Nref,
    }


def _random_case(seed):
    """Randomized gt/pred grid pair exercising every bookkeeping branch:
    detections, misses, false alarms, substitutions, mislocalizations at
    mixed scales, disjoint-frame overlaps, and multi-source same-class
    frames (the track path)."""
    rng = np.random.default_rng(seed)
    n_frames = int(rng.integers(30, 180))
    gt = np.full((n_frames, G), BG, np.int8)
    pred = np.full((n_frames, G), BG, np.int8)
    for _ in range(int(rng.integers(1, 9))):
        c = int(rng.integers(0, NB_CLASSES))
        f0 = int(rng.integers(0, n_frames))
        f1 = min(n_frames, f0 + int(rng.integers(1, 60)))
        i = int(rng.integers(0, N_EL))
        j = int(rng.integers(0, N_AZ))
        gt[f0:f1, i * N_AZ + j] = c
        if rng.random() < 0.35:  # second simultaneous same-class source
            i2 = int(rng.integers(0, N_EL))
            j2 = int(rng.integers(0, N_AZ))
            gt[f0:f1, i2 * N_AZ + j2] = c
        r = rng.random()
        if r < 0.15:
            continue  # detection miss
        # prediction: jittered location, possibly wrong class/shifted frames
        dj = int(rng.integers(-8, 9))
        di = int(rng.integers(-2, 3))
        pi = int(np.clip(i + di, 0, N_EL - 1))
        pj = (j + dj) % N_AZ
        pc = c if rng.random() > 0.15 else int(rng.integers(0, NB_CLASSES))
        s = int(rng.integers(-20, 21)) if rng.random() < 0.3 else 0
        p0, p1 = max(0, f0 + s), max(0, min(n_frames, f1 + s))
        pred[p0:p1, pi * N_AZ + pj] = pc
        if rng.random() < 0.25:  # extra predicted source, same class
            pred[p0:p1, int(rng.integers(0, G))] = pc
    for _ in range(int(rng.integers(0, 3))):  # pure false alarms
        f0 = int(rng.integers(0, n_frames))
        f1 = min(n_frames, f0 + int(rng.integers(1, 30)))
        pred[f0:f1, int(rng.integers(0, G))] = int(rng.integers(0, NB_CLASSES))
    return pred, gt


@pytest.mark.parametrize("block", range(4))
def test_matches_official_oracle_randomized(block):
    """dcase2022_metrics must agree EXACTLY with the independent literal
    restatement of the official algorithm on randomized multi-source
    grids — 160 cases across the 4 parametrized blocks (VERDICT r2 #3)."""
    for seed in range(block * 40, block * 40 + 40):
        pred, gt = _random_case(seed)
        want = oracle_dcase2022(pred, gt)
        got = dcase2022_metrics(pred, gt)  # default macro_over="all"
        for k in ("S", "D", "I", "Nref", "TP", "FP", "FP_spatial", "FN"):
            assert got[k] == want[k], f"seed {seed}: {k} {got[k]} != {want[k]}"
        for k in ("ER", "F_macro", "LE_macro", "LR_macro"):
            assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-12), (
                f"seed {seed}: {k}")
        np.testing.assert_allclose(
            got["classwise"]["F"], want["f_cls"], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            got["classwise"]["LE"], want["le_cls"], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            got["classwise"]["LR"], want["lr_cls"], rtol=1e-9, atol=1e-12)
        assert got["classwise"]["Nref"] == want["Nref_cls"].tolist(), (
            f"seed {seed}")


# ---------------------------------------------------------------------------
# CSV scoring workflow (seld_tpu/eval/score.py + `seld_tpu score`)
# ---------------------------------------------------------------------------


def _write_csv(path, rows):
    import numpy as np

    np.savetxt(path, np.asarray(rows, dtype=np.int64), fmt="%d", delimiter=",")


def test_score_csv_perfect_and_miss(tmp_path):
    from seld_tpu.config import Config
    from seld_tpu.eval.score import match_csv_dirs, score_csv_pairs

    gt_dir = tmp_path / "gt"
    pr_dir = tmp_path / "pred"
    gt_dir.mkdir(), pr_dir.mkdir()
    # two files; metadata frames at 100 ms (fanout 5 -> 20 ms labels)
    rows_a = [[f, 2, 0, 30, 10] for f in range(12)]
    rows_b = [[f, 7, 1, -120, -40] for f in range(4, 9)]
    _write_csv(gt_dir / "a.csv", rows_a)
    _write_csv(gt_dir / "b.csv", rows_b)
    # perfect predictions
    _write_csv(pr_dir / "a.csv", rows_a)
    _write_csv(pr_dir / "b.csv", rows_b)
    m = score_csv_pairs(match_csv_dirs(pr_dir, gt_dir), Config(),
                        macro_over="gt")
    assert m["ER"] == pytest.approx(0.0)
    assert m["F_macro"] == pytest.approx(1.0)
    # self-distance of a cell is arccos(1 - ulp) ~ 4e-7 deg, not exactly 0
    assert m["LE_macro"] == pytest.approx(0.0, abs=1e-5)
    assert m["n_files"] == 2

    # miss one whole file -> its (segment, class) pairs become deletions
    _write_csv(pr_dir / "b.csv", np.zeros((0, 5)))
    m2 = score_csv_pairs(match_csv_dirs(pr_dir, gt_dir), Config(),
                         macro_over="gt")
    assert m2["FN"] >= 1 and m2["ER"] > 0.0


def test_score_csv_segments_do_not_span_files(tmp_path):
    """An event at the END of file A and one at the START of file B land
    in different segments even though their frames are adjacent after
    concatenation (per-file padding to whole segments)."""
    from seld_tpu.config import Config
    from seld_tpu.eval.score import match_csv_dirs, score_csv_pairs

    gt_dir = tmp_path / "gt"
    pr_dir = tmp_path / "pred"
    gt_dir.mkdir(), pr_dir.mkdir()
    # file a: class 3 in its final metadata frame (frame 9 -> labels 45-49)
    _write_csv(gt_dir / "a.csv", [[9, 3, 0, 0, 0]])
    # file b: class 3 in its first metadata frame at a DIFFERENT location
    _write_csv(gt_dir / "b.csv", [[0, 3, 0, 90, 0]])
    # predictions swap the locations: each file's segment must be scored
    # independently (mislocalized in both -> 2 spatial FPs, 0 TPs)
    _write_csv(pr_dir / "a.csv", [[9, 3, 0, 90, 0]])
    _write_csv(pr_dir / "b.csv", [[0, 3, 0, 0, 0]])
    m = score_csv_pairs(match_csv_dirs(pr_dir, gt_dir), Config())
    assert m["Nref"] == 2
    assert m["TP"] == 0 and m["FP_spatial"] == 2


def test_score_csv_missing_prediction_is_error(tmp_path):
    from seld_tpu.eval.score import match_csv_dirs

    gt_dir = tmp_path / "gt"
    pr_dir = tmp_path / "pred"
    gt_dir.mkdir(), pr_dir.mkdir()
    _write_csv(gt_dir / "a.csv", [[0, 1, 0, 0, 0]])
    with pytest.raises(FileNotFoundError, match="predictions missing"):
        match_csv_dirs(pr_dir, gt_dir)


def test_score_cli_roundtrip(tmp_path, capsys):
    """predict-emitted CSV format scores cleanly through the CLI."""
    import json

    from seld_tpu.cli import main

    gt_dir = tmp_path / "gt"
    pr_dir = tmp_path / "pred"
    gt_dir.mkdir(), pr_dir.mkdir()
    rows = [[f, 5, 0, -60, 20] for f in range(10)]
    _write_csv(gt_dir / "clip.csv", rows)
    _write_csv(pr_dir / "clip.csv", rows)
    rc = main(["score", "--pred-dir", str(pr_dir), "--gt-dir", str(gt_dir),
               "--macro-over", "gt"])
    assert rc == 0
    out = capsys.readouterr().out
    payload = json.loads(out[out.index("{"):])
    assert payload["ER"] == pytest.approx(0.0)
    assert payload["F_macro"] == pytest.approx(1.0)


def test_bitmask_metrics_preserve_colocated_classes():
    """bitmask=True input keeps co-located different-class events that an
    argmax grid would collapse — and agrees with the oracle fed the same
    multi-hot content."""
    gt_bits = np.zeros((1, 50, G), np.uint16)
    # classes 2 AND 7 in the SAME cell for 10 frames
    gt_bits[0, 0:10, cell(5, 5)] = (1 << 2) | (1 << 7)
    m = dcase2022_metrics(gt_bits, gt_bits, bitmask=True, macro_over="gt")
    assert m["Nref"] == 2 and m["TP"] == 2  # both classes scored
    assert m["ER"] == pytest.approx(0.0)
    assert m["F_macro"] == pytest.approx(1.0)

    # argmax collapse would see only class 2
    gt_argmax = np.full((1, 50, G), BG, np.int8)
    gt_argmax[0, 0:10, cell(5, 5)] = 2
    m2 = dcase2022_metrics(gt_argmax, gt_argmax)
    assert m2["Nref"] == 1

    # miss one of the two co-located classes -> FN for it
    pred_bits = np.zeros((1, 50, G), np.uint16)
    pred_bits[0, 0:10, cell(5, 5)] = 1 << 2
    m3 = dcase2022_metrics(pred_bits, gt_bits, bitmask=True)
    assert m3["TP"] == 1 and m3["FN"] == 1


def test_bitmask_metrics_match_argmax_when_single_class():
    """With at most one class per cell, bitmask and argmax inputs are the
    same content and must produce identical scores."""
    rng = np.random.default_rng(7)
    bits = np.zeros((2, 60, G), np.uint16)
    am = np.full((2, 60, G), BG, np.int8)
    for _ in range(25):
        n = int(rng.integers(0, 2))
        f0 = int(rng.integers(0, 50))
        c = int(rng.integers(0, 13))
        g = int(rng.integers(0, G))
        bits[n, f0 : f0 + 8, g] = 1 << c
        am[n, f0 : f0 + 8, g] = c
    pred_bits, pred_am = bits.copy(), am.copy()
    pred_bits[0, :, : G // 2] = 0
    pred_am[0, :, : G // 2] = BG
    mb = dcase2022_metrics(pred_bits, bits, bitmask=True)
    ma = dcase2022_metrics(pred_am, am)
    for k in ("ER", "F_macro", "LE_macro", "LR_macro", "Nref", "TP", "FP",
              "FN", "FP_spatial", "S", "D", "I"):
        assert mb[k] == pytest.approx(ma[k]), k


def test_score_csv_colocated_multiclass(tmp_path):
    """Two different-class events at the same DOA and frame survive CSV
    scoring (the argmax route would drop one)."""
    from seld_tpu.config import Config
    from seld_tpu.eval.score import match_csv_dirs, score_csv_pairs

    gt_dir = tmp_path / "gt"
    pr_dir = tmp_path / "pred"
    gt_dir.mkdir(), pr_dir.mkdir()
    rows = [[f, 2, 0, 30, 10] for f in range(10)] + \
           [[f, 7, 1, 30, 10] for f in range(10)]
    _write_csv(gt_dir / "a.csv", rows)
    _write_csv(pr_dir / "a.csv", rows)
    m = score_csv_pairs(match_csv_dirs(pr_dir, gt_dir), Config(),
                        macro_over="gt")
    assert m["Nref"] == 2 and m["TP"] == 2
    assert m["F_macro"] == pytest.approx(1.0)


def _oracle_frames_bits(bits):
    """Oracle-side conversion for uint16 bitmask grids: every set bit of
    every cell contributes (class -> DOA) — multi-hot cells preserved."""
    out = []
    for f in range(bits.shape[0]):
        d = {}
        for c_idx in np.nonzero(bits[f] != 0)[0]:
            v = int(bits[f, c_idx])
            el = -85.0 + 10.0 * (c_idx // N_AZ)
            az = -175.0 + 10.0 * (c_idx % N_AZ)
            for cls in range(NB_CLASSES):
                if (v >> cls) & 1:
                    d.setdefault(cls, []).append([el, az])
        out.append(d)
    return out


def oracle_dcase2022_bits(pred_bits, gt_bits, thresh=20.0):
    """Literal official oracle over bitmask grids (reuses the segment/
    update/compute restatement via monkey-free composition)."""
    # reuse the scoring core by temporarily substituting the frame builder
    pred_frames = _oracle_frames_bits(np.asarray(pred_bits).reshape(-1, G))
    gt_frames = _oracle_frames_bits(np.asarray(gt_bits).reshape(-1, G))
    return _oracle_from_frames(pred_frames, gt_frames, thresh)


def _oracle_from_frames(pred_frames, gt_frames, thresh=20.0):
    from scipy.optimize import linear_sum_assignment

    pred_blocks = _oracle_segment_labels(pred_frames)
    gt_blocks = _oracle_segment_labels(gt_frames)
    TP = np.zeros(NB_CLASSES, int)
    FP = np.zeros(NB_CLASSES, int)
    FP_sp = np.zeros(NB_CLASSES, int)
    FN = np.zeros(NB_CLASSES, int)
    Nref = np.zeros(NB_CLASSES, int)
    total_DE = np.zeros(NB_CLASSES, float)
    DE_TP = np.zeros(NB_CLASSES, int)
    DE_FN = np.zeros(NB_CLASSES, int)
    S = D = I = 0
    for b in range(len(gt_blocks)):
        loc_FN = loc_FP = 0
        for c in range(NB_CLASSES):
            in_gt = c in gt_blocks[b]
            in_pred = c in pred_blocks[b]
            if in_gt:
                Nref[c] += 1
            if in_gt and in_pred:
                mtd, mtc = {}, {}
                gt_ind = gt_blocks[b][c][0][0]
                pr_ind = pred_blocks[b][c][0][0]
                for gi, gv in enumerate(gt_ind):
                    if gv in pr_ind:
                        cost = _oracle_distance_matrix(
                            gt_blocks[b][c][0][1][gi],
                            pred_blocks[b][c][0][1][pr_ind.index(gv)])
                        rows, cols = linear_sum_assignment(cost)
                        for r, cc in zip(rows, cols):
                            mtd.setdefault(int(r), []).append(cost[r, cc])
                            mtc.setdefault(int(r), []).append(cc)
                if not mtd:
                    loc_FN += 1
                    FN[c] += 1
                    DE_FN[c] += 1
                else:
                    for tid in mtd:
                        avg = sum(mtd[tid]) / len(mtc[tid])
                        total_DE[c] += avg
                        DE_TP[c] += 1
                        if avg <= thresh:
                            TP[c] += 1
                        else:
                            loc_FP += 1
                            FP_sp[c] += 1
            elif in_gt:
                loc_FN += 1
                FN[c] += 1
                DE_FN[c] += 1
            elif in_pred:
                loc_FP += 1
                FP[c] += 1
        S += min(loc_FP, loc_FN)
        D += max(0, loc_FN - loc_FP)
        I += max(0, loc_FP - loc_FN)
    return {"S": S, "D": D, "I": I, "Nref": int(Nref.sum()),
            "TP": int(TP.sum()), "FP": int(FP.sum()),
            "FP_spatial": int(FP_sp.sum()), "FN": int(FN.sum())}


def test_bitmask_metrics_match_official_oracle_randomized():
    """dcase2022_metrics(bitmask=True) agrees with the literal oracle on
    randomized MULTI-HOT grids (co-located different-class events)."""
    for seed in range(40):
        rng = np.random.default_rng(1000 + seed)
        n_frames = int(rng.integers(30, 140))
        gt = np.zeros((n_frames, G), np.uint16)
        pred = np.zeros((n_frames, G), np.uint16)
        for _ in range(int(rng.integers(1, 8))):
            c = int(rng.integers(0, NB_CLASSES))
            f0 = int(rng.integers(0, n_frames))
            f1 = min(n_frames, f0 + int(rng.integers(1, 50)))
            cell_i = int(rng.integers(0, G))
            gt[f0:f1, cell_i] |= np.uint16(1 << c)
            if rng.random() < 0.4:  # co-located second class
                c2 = int(rng.integers(0, NB_CLASSES))
                gt[f0:f1, cell_i] |= np.uint16(1 << c2)
            if rng.random() < 0.8:  # prediction, jittered cell
                pc = int(np.clip(cell_i + rng.integers(-3, 4), 0, G - 1))
                pred[f0:f1, pc] |= np.uint16(1 << c)
        want = oracle_dcase2022_bits(pred, gt)
        got = dcase2022_metrics(pred, gt, bitmask=True)
        for k in want:
            assert got[k] == want[k], f"seed {seed}: {k} {got[k]} != {want[k]}"
