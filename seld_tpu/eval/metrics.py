"""Evaluation metrics.

Two families:

1. Reference-parity cell accuracies (ref trainer.py:541-556): overall
   argmax accuracy over all (frame, cell) and accuracy restricted to
   non-background ground-truth cells.

2. DCASE-style SELD metrics (ER / F / LE / LR). The reference never
   computes these (SURVEY §5) — they are the community's standard and the
   rebuild's north-star requires them. Semantics implemented here
   (documented frame/segment-based variant of the DCASE2022 criteria,
   adapted to the grid output representation):

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
