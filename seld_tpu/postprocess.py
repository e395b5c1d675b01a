"""Decoded-grid post-processing: temporal majority smoothing.

The reference decodes plain per-frame argmax and stops
(ref trainer.py:541-556). Standard SELD practice applies a temporal
median/majority filter to the decoded event activity before scoring —
single-frame flickers (one spurious event frame inside background, or
one background frame inside a held event) are almost always decode
noise at 20 ms resolution.

`smooth_classes` is the categorical analogue of a median filter: each
(frame, cell)'s class becomes the MAJORITY class over a centered
temporal window of `width` frames (shrunk at clip edges), with the tie
broken toward the frame's ORIGINAL class (so the filter is idempotent
on already-smooth regions and width=1 is the identity). Vectorized as
one cumulative-sum pass per class — O(M·T·G) with no Python loops over
frames/cells; ~350 MB peak for a full eval corpus, trivial per clip.

Composition rules:
  * applies to COMPLETE decoded grids only — predict (offline and the
    assembled stream_predict result: both paths filter the same
    assembled grid, so offline==stream bit-equality is preserved by
    construction), eval (host-side on the gathered prediction grids,
    so an eval-time width SWEEP costs zero extra forwards);
  * the serve daemon's incremental fragments stay raw (a centered
    filter needs lookahead; smoothing is a full-clip decode op);
  * composes with bg_bias / TTA / int8 — those shape the per-frame
    decode, this smooths its temporal trajectory afterwards.
"""

from __future__ import annotations

import numpy as np


def validate_width(width: int) -> int:
    width = int(width)
    if width < 0:
        raise ValueError(f"median_filter width must be >= 0, got {width}")
    if width and width % 2 == 0:
        raise ValueError(
            f"median_filter width must be odd (centered window), got {width}"
        )
    return width


def smooth_classes(classes: np.ndarray, width: int,
                   num_classes: int) -> np.ndarray:
    """Temporal majority filter on decoded class grids.

    classes: int array (..., T, G) of per-frame per-cell argmax classes.
    width: odd window length in frames (0 or 1 = identity).
    Returns the same shape/dtype; each frame's class is the most frequent
    class in its centered window, ties broken toward the original class.
    """
    width = validate_width(width)
    if width <= 1 or classes.size == 0:
        return classes
    t = classes.shape[-2]
    half = width // 2
    # windowed counts per class via cumulative sums along T
    lo = np.maximum(np.arange(t) - half, 0)
    hi = np.minimum(np.arange(t) + half + 1, t)
    best_count = np.zeros(classes.shape, np.int32)
    best_class = np.zeros(classes.shape, classes.dtype)
    orig_count = np.zeros(classes.shape, np.int32)
    for m in range(num_classes):
        binary = (classes == m)
        csum = np.zeros(
            (*classes.shape[:-2], t + 1, classes.shape[-1]), np.int32
        )
        np.cumsum(binary, axis=-2, out=csum[..., 1:, :])
        counts = csum[..., hi, :] - csum[..., lo, :]  # (..., T, G)
        take = counts > best_count
        best_count = np.where(take, counts, best_count)
        best_class = np.where(take, classes.dtype.type(m), best_class)
        orig_count = np.where(classes == m, counts, orig_count)
    # tie toward the original class: keep it whenever its own count
    # reaches the maximum (strict > above means a later class never
    # displaces an equal earlier one, so >= here is exact)
    keep = orig_count >= best_count
    return np.where(keep, classes, best_class)
