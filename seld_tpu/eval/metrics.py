"""Evaluation metrics.

Three families:

1. Reference-parity cell accuracies (ref trainer.py:541-556): overall
   argmax accuracy over all (frame, cell) and accuracy restricted to
   non-background ground-truth cells.

2. ``seld_metrics`` — a fast frame-level SELD variant (kept from round 1,
   documented below).

3. ``dcase2022_metrics`` — the official DCASE2022 criteria: 1-second
   segments, class-wise segment-level decisions, frame-level Hungarian
   DOA assignment, location-dependent detection (F_{<=20 deg}), and
   class-dependent localization (LE_CD / LR_CD) with macro averaging.
   See its docstring for the exact semantics matched.

Family-2 semantics (documented frame/segment-based variant of the
DCASE2022 criteria, adapted to the grid output representation):

   * A frame-level match for class c: ground truth has c active in some
     cell(s) and a prediction of c exists within 20 deg great-circle
     distance of a GT cell center -> TP; predicted-but-unmatched -> FP;
     GT-but-unmatched -> FN.
   * LE (class-dependent localization error): mean angular distance of
     matched TPs (nearest GT cell).
   * LR (localization recall): TP / (TP + FN).
   * F  : 2*TP / (2*TP + FP + FN) over location-aware frame decisions.
   * ER (segment-based error rate): over 1 s segments,
     (S + D + I) / N with S = min(FN, FP), D = FN - S, I = FP - S
     aggregated per segment from frame counts.
"""

from __future__ import annotations

import functools

import numpy as np

from seld_tpu.grid import cell_centers


def accuracy_metrics(pred_classes: np.ndarray, true_classes: np.ndarray,
                     background_class: int) -> dict:
    """Overall + non-background argmax cell accuracy
    (ref trainer.py:541-556). Inputs: integer class grids (..., G)."""
    pred_classes = np.asarray(pred_classes)
    true_classes = np.asarray(true_classes)
    overall = float((pred_classes == true_classes).mean()) * 100.0
    non_bg = true_classes != background_class
    if non_bg.sum() > 0:
        nb_acc = float(
            (pred_classes[non_bg] == true_classes[non_bg]).mean()
        ) * 100.0
    else:
        nb_acc = 0.0
    return {
        "overall_accuracy": overall,
        "non_bg_accuracy": nb_acc,
        "active_events": int(non_bg.sum()),
        "total_cells": int(non_bg.size),
    }


@functools.lru_cache(maxsize=4)
def _cell_angles(n_el: int, n_az: int):
    el, az = cell_centers(n_el, n_az)
    el_grid = np.repeat(el.astype(np.float64), n_az)  # (G,)
    az_grid = np.tile(az.astype(np.float64), n_el)
    return np.deg2rad(el_grid), np.deg2rad(az_grid)


def _angular_distance_deg(el1, az1, el2, az2):
    """Great-circle distance (degrees) between direction sets; inputs in
    radians, broadcastable."""
    cos_d = np.sin(el1) * np.sin(el2) + np.cos(el1) * np.cos(el2) * np.cos(az1 - az2)
    return np.rad2deg(np.arccos(np.clip(cos_d, -1.0, 1.0)))


def seld_metrics(
    pred_classes: np.ndarray,
    true_classes: np.ndarray,
    n_el: int = 18,
    n_az: int = 36,
    num_classes: int = 14,
    doa_threshold_deg: float = 20.0,
    frames_per_segment: int = 50,  # 1 s at 50 fps
) -> dict:
    """Location-aware SELD metrics from argmax class grids.

    pred_classes/true_classes: (N, T, G) int — argmax class per cell
    (background = num_classes - 1).
    """
    pred = np.asarray(pred_classes).reshape(-1, n_el * n_az)  # (F, G)
    true = np.asarray(true_classes).reshape(-1, n_el * n_az)
    n_frames = pred.shape[0]
    bg = num_classes - 1
    el_r, az_r = _cell_angles(n_el, n_az)

    tp = fp = fn = 0
    le_sum, le_count = 0.0, 0
    # per-class tallies for macro aggregation (DCASE2022 reports
    # macro-averaged F/LE/LR over classes)
    c_tp = np.zeros(num_classes, np.int64)
    c_fp = np.zeros(num_classes, np.int64)
    c_fn = np.zeros(num_classes, np.int64)
    c_le_sum = np.zeros(num_classes, np.float64)
    c_le_cnt = np.zeros(num_classes, np.int64)
    # per-frame FP/FN counts for segment ER
    frame_fp = np.zeros(n_frames, np.int64)
    frame_fn = np.zeros(n_frames, np.int64)
    frame_n = np.zeros(n_frames, np.int64)  # GT event count per frame

    # Sparse vectorized pass: work on (frame, class) keys of active cells.
    def keyed(arr):
        f_idx, c_idx = np.nonzero(arr != bg)  # (K,) frames / cells
        keys = f_idx.astype(np.int64) * num_classes + arr[f_idx, c_idx]
        order = np.argsort(keys, kind="stable")
        return keys[order], c_idx[order]

    t_keys, t_cells = keyed(true)
    p_keys, p_cells = keyed(pred)
    t_uniq, t_starts = np.unique(t_keys, return_index=True)
    p_uniq, p_starts = np.unique(p_keys, return_index=True)
    t_ends = np.append(t_starts[1:], len(t_keys))
    p_ends = np.append(p_starts[1:], len(p_keys))

    np.add.at(frame_n, (t_uniq // num_classes).astype(np.int64), 1)

    # Unmatched (frame, class) keys are pure FN / FP — fully vectorized.
    matched_mask_t = np.isin(t_uniq, p_uniq)
    matched_mask_p = np.isin(p_uniq, t_uniq)
    fn_keys = t_uniq[~matched_mask_t]
    fp_keys = p_uniq[~matched_mask_p]
    fn += len(fn_keys)
    fp += len(fp_keys)
    np.add.at(frame_fn, (fn_keys // num_classes).astype(np.int64), 1)
    np.add.at(frame_fp, (fp_keys // num_classes).astype(np.int64), 1)
    np.add.at(c_fn, (fn_keys % num_classes).astype(np.int64), 1)
    np.add.at(c_fp, (fp_keys % num_classes).astype(np.int64), 1)

    # Matched keys need the min angular distance between cell sets.
    t_pos = np.nonzero(matched_mask_t)[0]
    p_pos = np.searchsorted(p_uniq, t_uniq[t_pos])
    for ti, pi in zip(t_pos, p_pos):
        t_cl = t_cells[t_starts[ti] : t_ends[ti]]
        p_cl = p_cells[p_starts[pi] : p_ends[pi]]
        d = _angular_distance_deg(
            el_r[p_cl][:, None], az_r[p_cl][:, None],
            el_r[t_cl][None, :], az_r[t_cl][None, :],
        )
        dmin = float(d.min())
        le_sum += dmin
        le_count += 1
        f = int(t_uniq[ti]) // num_classes
        cls = int(t_uniq[ti]) % num_classes
        c_le_sum[cls] += dmin
        c_le_cnt[cls] += 1
        if dmin <= doa_threshold_deg:
            tp += 1
            c_tp[cls] += 1
        else:
            # detected the class but localized it out of threshold:
            # counts as both a missed GT and a false prediction
            fn += 1
            fp += 1
            c_fn[cls] += 1
            c_fp[cls] += 1
            frame_fn[f] += 1
            frame_fp[f] += 1

    # Segment-based ER
    n_segments = -(-n_frames // frames_per_segment)
    s_total = d_total = i_total = n_total = 0
    for s in range(n_segments):
        sl = slice(s * frames_per_segment, (s + 1) * frames_per_segment)
        seg_fn = int(frame_fn[sl].sum())
        seg_fp = int(frame_fp[sl].sum())
        seg_n = int(frame_n[sl].sum())
        subs = min(seg_fn, seg_fp)
        s_total += subs
        d_total += seg_fn - subs
        i_total += seg_fp - subs
        n_total += seg_n

    er = (s_total + d_total + i_total) / max(n_total, 1)
    f_score = 2 * tp / max(2 * tp + fp + fn, 1)
    le = le_sum / le_count if le_count else float("nan")
    lr = tp / max(tp + fn, 1)

    # Macro (class-averaged) aggregation over classes that occur in the
    # ground truth or predictions — DCASE2022 convention.
    active = (c_tp + c_fp + c_fn) > 0
    active[num_classes - 1] = False  # background never scored
    with np.errstate(invalid="ignore", divide="ignore"):
        cf = 2 * c_tp / np.maximum(2 * c_tp + c_fp + c_fn, 1)
        clr = c_tp / np.maximum(c_tp + c_fn, 1)
        cle = np.where(c_le_cnt > 0, c_le_sum / np.maximum(c_le_cnt, 1), np.nan)
    f_macro = float(cf[active].mean()) if active.any() else 0.0
    lr_macro = float(clr[active].mean()) if active.any() else 0.0
    le_vals = cle[active & (c_le_cnt > 0)]
    le_macro = float(le_vals.mean()) if le_vals.size else float("nan")

    return {
        "ER": float(er),
        "F": float(f_score),
        "LE": float(le),
        "LR": float(lr),
        "F_macro": f_macro,
        "LE_macro": le_macro,
        "LR_macro": lr_macro,
        "tp": int(tp),
        "fp": int(fp),
        "fn": int(fn),
    }


# ---------------------------------------------------------------------------
# Official DCASE2022 SELD metrics
# ---------------------------------------------------------------------------

def grid_to_frame_doas(class_grid: np.ndarray, n_el: int, n_az: int,
                       num_classes: int) -> list:
    """Convert argmax class grids to per-frame per-class DOA sets.

    class_grid: (..., G) int — argmax class per cell, background =
    num_classes - 1. Returns a list (one entry per flattened frame) of
    dicts {class: (K, 2) float array of (el_deg, az_deg) cell centers}.
    """
    grid = np.asarray(class_grid).reshape(-1, n_el * n_az)
    bg = num_classes - 1
    el_r, az_r = _cell_angles(n_el, n_az)
    el_deg, az_deg = np.rad2deg(el_r), np.rad2deg(az_r)
    frames = []
    for f in range(grid.shape[0]):
        cells = np.nonzero(grid[f] != bg)[0]
        per_class: dict = {}
        for c in np.unique(grid[f, cells]):
            sel = cells[grid[f, cells] == c]
            per_class[int(c)] = np.stack(
                [el_deg[sel], az_deg[sel]], axis=-1
            )
        frames.append(per_class)
    return frames


def _hungarian_mean_distance(gt_doas: np.ndarray, pred_doas: np.ndarray) -> float:
    """Minimum-cost one-to-one assignment between two DOA sets
    ((K,2) arrays of (el_deg, az_deg)); returns the mean angular distance
    over the min(len(gt), len(pred)) matched pairs."""
    from scipy.optimize import linear_sum_assignment

    el1 = np.deg2rad(gt_doas[:, 0])[:, None]
    az1 = np.deg2rad(gt_doas[:, 1])[:, None]
    el2 = np.deg2rad(pred_doas[:, 0])[None, :]
    az2 = np.deg2rad(pred_doas[:, 1])[None, :]
    cost = _angular_distance_deg(el1, az1, el2, az2)
    rows, cols = linear_sum_assignment(cost)
    return float(cost[rows, cols].mean())


def dcase2022_metrics(
    pred_classes: np.ndarray,
    true_classes: np.ndarray,
    n_el: int = 18,
    n_az: int = 36,
    num_classes: int = 14,
    doa_threshold_deg: float = 20.0,
    frames_per_segment: int = 50,  # 1 s at 50 fps
) -> dict:
    """Official DCASE2022 SELD metrics from argmax class grids.

    Exact criteria matched (the DCASE2021/2022 joint-measure evaluation;
    Politis et al. 2020 + the location-dependent F update):

    * Time is divided into non-overlapping 1 s segments. Every decision is
      per (segment, class); the background class is never scored.
    * Nref counts (segment, class) pairs present in the ground truth.
    * class in GT only            -> FN (detection miss).
    * class in prediction only    -> FP (detection false alarm).
    * class in both: frames within the segment where BOTH have the class
      are matched; per matched frame the GT and predicted DOA sets are
      aligned by minimum-cost one-to-one (Hungarian) assignment and the
      mean pair distance recorded. If no frame matches -> FN. Otherwise
      the segment's spatial distance is the mean over matched frames:
        <= threshold -> TP;
        >  threshold -> spatial FP (counted in ER's insertions and in
                        F's denominator, but the class WAS detected, so
                        it still counts toward LR's detected set).
    * ER  = (S + D + I) / Nref over segments, with per-segment
      S = min(FP_seg, FN_seg), D = FN_seg - S, I = FP_seg - S
      (spatial FPs contribute to FP_seg, matching the official
      update_seld_scores bookkeeping).
    * F   = TP / (TP + FP_spatial + 0.5 (FP + FN))      [per class]
    * LE_CD = mean segment spatial distance over detected segments
      (threshold-independent); 180 deg for classes never detected.
    * LR_CD = detected / (detected + FN)                 [per class]
    * Macro scores average per-class F/LE/LR over the classes that occur
      in the ground truth; micro scores pool counts over classes.

    Inputs are argmax class grids (N, T, G) with background =
    num_classes - 1; active cells' centers are the DOA sets (multiple
    cells of one class in a frame = multiple simultaneous sources).
    """
    pred = np.asarray(pred_classes).reshape(-1, n_el * n_az)
    true = np.asarray(true_classes).reshape(-1, n_el * n_az)
    n_frames = pred.shape[0]
    n_segments = -(-n_frames // frames_per_segment)

    pred_frames = grid_to_frame_doas(pred, n_el, n_az, num_classes)
    true_frames = grid_to_frame_doas(true, n_el, n_az, num_classes)

    n_scored = num_classes - 1  # background excluded
    TP = np.zeros(n_scored, np.int64)
    FP = np.zeros(n_scored, np.int64)          # detection false alarms
    FP_sp = np.zeros(n_scored, np.int64)       # detected but mislocalized
    FN = np.zeros(n_scored, np.int64)
    Nref = np.zeros(n_scored, np.int64)
    DE_total = np.zeros(n_scored, np.float64)  # sum of segment distances
    DE_TP = np.zeros(n_scored, np.int64)       # detected segments
    DE_FN = np.zeros(n_scored, np.int64)       # undetected GT segments
    S = D = I = 0

    for s in range(n_segments):
        lo, hi = s * frames_per_segment, min((s + 1) * frames_per_segment,
                                             n_frames)
        seg_true = true_frames[lo:hi]
        seg_pred = pred_frames[lo:hi]
        gt_classes = set().union(*[f.keys() for f in seg_true]) if seg_true else set()
        pr_classes = set().union(*[f.keys() for f in seg_pred]) if seg_pred else set()
        loc_FN = loc_FP = 0
        for c in gt_classes | pr_classes:
            in_gt, in_pr = c in gt_classes, c in pr_classes
            if in_gt:
                Nref[c] += 1
            if in_gt and in_pr:
                dists = [
                    _hungarian_mean_distance(t[c], p[c])
                    for t, p in zip(seg_true, seg_pred)
                    if c in t and c in p
                ]
                if not dists:
                    # class active in the segment for both, but never in
                    # the same frame -> detection miss
                    loc_FN += 1
                    FN[c] += 1
                    DE_FN[c] += 1
                else:
                    avg = float(np.mean(dists))
                    DE_total[c] += avg
                    DE_TP[c] += 1
                    if avg <= doa_threshold_deg:
                        TP[c] += 1
                    else:
                        loc_FP += 1
                        FP_sp[c] += 1
            elif in_gt:
                loc_FN += 1
                FN[c] += 1
                DE_FN[c] += 1
            else:
                loc_FP += 1
                FP[c] += 1
        S += min(loc_FP, loc_FN)
        D += max(0, loc_FN - loc_FP)
        I += max(0, loc_FP - loc_FN)

    eps = np.finfo(np.float64).eps
    ER = (S + D + I) / max(int(Nref.sum()), 1)

    f_cls = TP / (TP + FP_sp + 0.5 * (FP + FN) + eps)
    lr_cls = DE_TP / (DE_TP + DE_FN + eps)
    le_cls = np.where(DE_TP > 0, DE_total / np.maximum(DE_TP, 1), 180.0)

    scored = Nref > 0
    if scored.any():
        F_macro = float(f_cls[scored].mean())
        LR_macro = float(lr_cls[scored].mean())
        LE_macro = float(le_cls[scored].mean())
    else:
        F_macro, LR_macro, LE_macro = 0.0, 0.0, 180.0

    F_micro = float(TP.sum() / (TP.sum() + FP_sp.sum()
                                + 0.5 * (FP.sum() + FN.sum()) + eps))
    LR_micro = float(DE_TP.sum() / (DE_TP.sum() + DE_FN.sum() + eps))
    LE_micro = (float(DE_total.sum() / DE_TP.sum()) if DE_TP.sum() > 0
                else 180.0)

    # SELD error: the DCASE ranking aggregate.
    seld_err = float(np.mean([
        ER, 1.0 - F_macro, LE_macro / 180.0, 1.0 - LR_macro
    ]))

    return {
        "ER": float(ER),
        "F_macro": F_macro, "LE_macro": LE_macro, "LR_macro": LR_macro,
        "F_micro": F_micro, "LE_micro": LE_micro, "LR_micro": LR_micro,
        "SELD_error": seld_err,
        "S": int(S), "D": int(D), "I": int(I),
        "Nref": int(Nref.sum()),
        "TP": int(TP.sum()), "FP": int(FP.sum()),
        "FP_spatial": int(FP_sp.sum()), "FN": int(FN.sum()),
        "classwise": {
            "F": f_cls.tolist(), "LE": le_cls.tolist(), "LR": lr_cls.tolist(),
            "Nref": Nref.tolist(),
        },
    }
