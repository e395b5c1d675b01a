"""ACCDOA output representation: activity-coupled Cartesian DOA.

The reference has no ACCDOA anywhere (SURVEY C6 — verified by repo-wide
search); BASELINE.json's north-star configs ask for "attention -> ACCDOA
heads", so seld_tpu provides the representation as an alternative to the
spatial-grid head:

  * the model emits one Cartesian vector per (frame, event-class):
    (B, T, num_event_classes, 3); the vector NORM is the class activity
    and its DIRECTION the DOA (Shimada et al. 2021);
  * targets come straight from metadata rows — unit vectors on active
    (frame, class) pairs, zeros elsewhere (single-ACCDOA: one instance
    per class per frame, later rows win like the grid rasterizer's
    overwrite semantics);
  * loss is masked MSE over the vectors (the standard ACCDOA objective);
  * predictions decode back onto the az/el grid (activity threshold on
    the norm, direction -> polar_to_grid) so every grid-based metric and
    visualization in the framework applies unchanged.

Multi-ACCDOA (Shimada et al. 2022, the DCASE2022-baseline representation)
extends this to N=3 track slots per class so SAME-class overlapping
sources become representable:

  * the model emits (B, T, N, C, 3);
  * targets are the ADPIT layout (T, 6, 4, C): slot 0 holds the
    single-source case (A0), slots 1-2 the two-source case (B0, B1),
    slots 3-5 the three-source case (C0, C1, C2); channel 0 is the
    activity flag and 1:4 the unit DOA;
  * the loss is ADPIT (auxiliary duplicating permutation invariant
    training): per (frame, class), the minimum over the 13 track-to-
    target assignments (1 A + 6 B + 6 C), with each candidate padded by
    the other cases' canonical assignments so inapplicable cases tie
    rather than win;
  * decoding paints every active track's class into the grid, so two
    same-class sources land in two cells.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.grid import cell_index, polar_to_grid
from seld_tpu.models.layers import CNNEncoder, ConformerBlock


def doa_unit_vector(az_deg, el_deg, xp=np):
    """(azimuth, elevation) degrees -> unit vector(s) (..., 3) = (x, y, z)."""
    az = xp.deg2rad(xp.asarray(az_deg, dtype=xp.float32))
    el = xp.deg2rad(xp.asarray(el_deg, dtype=xp.float32))
    return xp.stack(
        [xp.cos(el) * xp.cos(az), xp.cos(el) * xp.sin(az), xp.sin(el)], axis=-1
    )


def rasterize_accdoa_targets(
    frames: np.ndarray,
    classes: np.ndarray,
    azimuths: np.ndarray,
    elevations: np.ndarray,
    total_frames: int,
    num_event_classes: int = 13,
    fanout: int = 5,
) -> np.ndarray:
    """Metadata rows -> (T, num_event_classes, 3) float32 ACCDOA targets.

    Active (frame, class) pairs carry the unit DOA vector (later rows
    overwrite earlier ones, mirroring ref dataset.py:109-111 semantics);
    inactive pairs are zero vectors.
    """
    out = np.zeros((total_frames, num_event_classes, 3), np.float32)
    if len(frames) == 0:
        return out
    vec = doa_unit_vector(azimuths, elevations)  # (R, 3)
    base = np.asarray(frames, np.int64) * fanout
    cls = np.asarray(classes, np.int64)
    for o in range(fanout):
        t = base + o
        valid = t < total_frames
        out[t[valid], cls[valid]] = vec[valid]
    return out


class SELDConformerACCDOA(nn.Module):
    """Conformer backbone with an ACCDOA head:
    (B, T, C, F) -> (B, T, num_event_classes, 3) Cartesian vectors
    (tanh-bounded to [-1, 1] per component). With num_tracks > 1 the
    head is multi-ACCDOA: (B, T, num_tracks, num_event_classes, 3)."""

    num_event_classes: int = 13
    num_tracks: int = 1
    cnn_channels: Sequence[int] = (64, 128, 256, 512)
    d_model: int = 256
    n_heads: int = 4
    n_layers: int = 2
    kernel_size: int = 31
    dropout: float = 0.3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nkw = dict(norm_dtype=self.norm_dtype, **kw)
        x = x.astype(self.dtype)
        x = jnp.swapaxes(x, 2, 3)  # NHWC
        x = CNNEncoder(tuple(self.cnn_channels), **nkw)(x, train=train)
        x = nn.Dense(self.d_model, name="proj", **kw)(x)
        for i in range(self.n_layers):
            x = ConformerBlock(
                d_model=self.d_model, n_heads=self.n_heads,
                d_ff=4 * self.d_model, kernel_size=self.kernel_size,
                dropout=self.dropout, name=f"block_{i}", **nkw,
            )(x, train=train)
        b, t, _ = x.shape
        y = nn.Dense(
            self.num_tracks * self.num_event_classes * 3, name="accdoa", **kw
        )(x)
        y = jnp.tanh(y.astype(jnp.float32))
        if self.num_tracks == 1:
            return y.reshape(b, t, self.num_event_classes, 3)
        return y.reshape(b, t, self.num_tracks, self.num_event_classes, 3)


def accdoa_loss(pred_vectors, target_vectors, example_mask=None):
    """Masked MSE over the ACCDOA vectors: (B, T, C, 3) each."""
    sq = jnp.square(pred_vectors.astype(jnp.float32) - target_vectors)
    per_example = jnp.mean(sq.reshape(sq.shape[0], -1), axis=-1)
    if example_mask is None:
        return jnp.mean(per_example)
    em = example_mask.astype(jnp.float32)
    return jnp.sum(per_example * em) / jnp.maximum(jnp.sum(em), 1e-8)


class ACCDOALossFn:
    """(pred, targets, example_mask) -> (total, breakdown) — the same
    calling convention as losses.SELDLossFn, so the training runtime is
    representation-agnostic."""

    def __call__(self, pred_vectors, target_vectors, example_mask=None):
        loss = accdoa_loss(pred_vectors, target_vectors, example_mask)
        return loss, {"accdoa": loss}


def decode_accdoa_to_grid_jnp(
    vectors,
    n_el: int = 18,
    n_az: int = 36,
    num_classes: int = 14,
    activity_threshold: float = 0.5,
):
    """Jit-friendly (..., C_events, 3) -> (..., G) int8 class grid.

    Scatter of active classes into their decoded cells; when multiple
    classes decode into one cell the highest class index wins (the numpy
    variant keeps iteration order — both are valid argmax-style grids for
    metric purposes).
    """
    vectors = vectors.astype(jnp.float32)
    c_events = vectors.shape[-2]
    norm = jnp.linalg.norm(vectors, axis=-1)  # (..., C)
    active = norm > activity_threshold
    az = jnp.rad2deg(jnp.arctan2(vectors[..., 1], vectors[..., 0]))
    el = jnp.rad2deg(
        jnp.arcsin(jnp.clip(vectors[..., 2] / jnp.maximum(norm, 1e-9), -1, 1))
    )
    i, j = polar_to_grid(az, el, n_el, n_az, xp=jnp)
    cells = cell_index(i, j, n_az)  # (..., C)

    g = n_el * n_az
    onehot = jax.nn.one_hot(cells, g, dtype=jnp.int32)  # (..., C, G)
    cls_ids = jnp.arange(c_events, dtype=jnp.int32)
    cls_ids = cls_ids.reshape((1,) * (vectors.ndim - 2) + (c_events, 1))
    painted = onehot * active[..., None].astype(jnp.int32) * (cls_ids + 1)
    best = jnp.max(painted, axis=-2)  # (..., G); 0 = background
    return jnp.where(best > 0, best - 1, num_classes - 1).astype(jnp.int8)


def decode_accdoa_to_grid(
    vectors: np.ndarray,
    n_el: int = 18,
    n_az: int = 36,
    num_classes: int = 14,
    activity_threshold: float = 0.5,
) -> np.ndarray:
    """(..., T, C_events, 3) vectors -> (..., T, G) argmax-style class grid
    (background = num_classes - 1), making the grid metrics/visualizations
    directly applicable to ACCDOA models."""
    vectors = np.asarray(vectors, np.float32)
    lead = vectors.shape[:-2]
    c_events = vectors.shape[-2]
    norm = np.linalg.norm(vectors, axis=-1)  # (..., C)
    active = norm > activity_threshold
    az = np.rad2deg(np.arctan2(vectors[..., 1], vectors[..., 0]))
    el = np.rad2deg(
        np.arcsin(np.clip(vectors[..., 2] / np.maximum(norm, 1e-9), -1, 1))
    )
    i, j = polar_to_grid(az, el, n_el, n_az)
    cells = cell_index(i.astype(np.int64), j.astype(np.int64), n_az)

    grid = np.full(lead + (n_el * n_az,), num_classes - 1, np.int8)
    idx = np.nonzero(active)
    flat_lead = tuple(idx[:-1])
    grid[flat_lead + (cells[idx],)] = idx[-1]
    return grid


# ---------------------------------------------------------------------------
# Multi-ACCDOA (ADPIT) — Shimada et al. 2022, the DCASE2022-baseline
# representation. The reference has none of this; it is a north-star
# extension on top of the single-ACCDOA head above.
# ---------------------------------------------------------------------------

ADPIT_SLOTS = 6  # A0 | B0 B1 | C0 C1 C2


def rasterize_adpit_targets(
    frames: np.ndarray,
    classes: np.ndarray,
    azimuths: np.ndarray,
    elevations: np.ndarray,
    total_frames: int,
    num_event_classes: int = 13,
    fanout: int = 5,
) -> np.ndarray:
    """Metadata rows -> (T, 6, 4, C) float32 ADPIT targets.

    Per (metadata frame, class): 1 simultaneous source fills slot 0 (A0),
    2 sources fill slots 1-2 (B0, B1), >=3 fill slots 3-5 (C0, C1, C2;
    extras beyond three are dropped, matching the 3-track ceiling).
    Channel 0 of axis -2 is the activity flag; channels 1:4 the unit DOA
    vector. Fully vectorized via per-(frame, class) group ranking.
    """
    out = np.zeros((total_frames, ADPIT_SLOTS, 4, num_event_classes), np.float32)
    if len(frames) == 0:
        return out
    frames = np.asarray(frames, np.int64)
    classes = np.asarray(classes, np.int64)
    vec = doa_unit_vector(azimuths, elevations)  # (R, 3)

    # group rows by (frame, class); rank within group; count per group
    keys = frames * num_event_classes + classes
    order = np.argsort(keys, kind="stable")
    keys_s = keys[order]
    group_start = np.r_[True, keys_s[1:] != keys_s[:-1]]
    group_id = np.cumsum(group_start) - 1
    first_idx = np.nonzero(group_start)[0]
    rank = np.arange(len(keys_s)) - first_idx[group_id]
    count = np.bincount(group_id)[group_id]

    slot = np.where(count == 1, 0, np.where(count == 2, 1 + rank, 3 + rank))
    keep = slot < ADPIT_SLOTS  # drops the 4th+ simultaneous source

    f_k = frames[order][keep]
    c_k = classes[order][keep]
    v_k = vec[order][keep]
    s_k = slot[keep]
    base = f_k * fanout
    for o in range(fanout):
        t = base + o
        valid = t < total_frames
        out[t[valid], s_k[valid], 0, c_k[valid]] = 1.0
        out[t[valid], s_k[valid], 1:4, c_k[valid]] = v_k[valid]
    return out


def adpit_loss(pred_vectors, targets, example_mask=None):
    """ADPIT loss.

    pred_vectors: (B, T, 3, C, 3) multi-ACCDOA output (tracks, classes,
    axes). targets: (B, T, 6, 4, C) ADPIT layout. Per (frame, class) the
    loss is the minimum over the 13 track-to-slot assignments — 1 for the
    single-source case (A0 A0 A0), 6 for two sources (orderings of
    B0 B0 B1 / B0 B1 B1), 6 for three (permutations of C0 C1 C2) — where
    each candidate target is padded with the other cases' canonical
    assignments so candidates from inapplicable cases tie with the
    applicable one instead of winning with zeros.
    """
    f32 = jnp.float32
    pred = pred_vectors.astype(f32)  # (B, T, N, C, 3)
    targets = targets.astype(f32)

    def slot(i):  # activity-masked DOA for slot i: (B, T, 3, C)
        return targets[:, :, i, 0:1, :] * targets[:, :, i, 1:4, :]

    a0 = slot(0)
    b0, b1 = slot(1), slot(2)
    c0, c1, c2 = slot(3), slot(4), slot(5)

    def cand(x, y, z):  # -> (B, T, N=3, 3axes, C)
        return jnp.stack([x, y, z], axis=2)

    aaa = cand(a0, a0, a0)
    b_canon = cand(b0, b0, b1)
    c_canon = cand(c0, c1, c2)
    pad_a = b_canon + c_canon
    pad_b = aaa + c_canon
    pad_c = aaa + b_canon

    candidates = (
        [aaa + pad_a]
        + [cand(*p) + pad_b for p in (
            (b0, b0, b1), (b0, b1, b0), (b1, b0, b0),
            (b0, b1, b1), (b1, b0, b1), (b1, b1, b0),
        )]
        + [cand(*p) + pad_c for p in (
            (c0, c1, c2), (c0, c2, c1), (c1, c0, c2),
            (c1, c2, c0), (c2, c0, c1), (c2, c1, c0),
        )]
    )
    # pred to (B, T, N, 3axes, C) to match
    p = jnp.moveaxis(pred, -1, -2)
    # per-candidate MSE over (track, axis) -> (B, T, C)
    losses = jnp.stack(
        [jnp.mean(jnp.square(p - c), axis=(2, 3)) for c in candidates], axis=0
    )
    per_frame_class = jnp.min(losses, axis=0)  # (B, T, C)
    per_example = jnp.mean(
        per_frame_class.reshape(per_frame_class.shape[0], -1), axis=-1
    )
    if example_mask is None:
        return jnp.mean(per_example)
    em = example_mask.astype(f32)
    return jnp.sum(per_example * em) / jnp.maximum(jnp.sum(em), 1e-8)


class ADPITLossFn:
    """Same calling convention as ACCDOALossFn / losses.SELDLossFn."""

    def __call__(self, pred_vectors, targets, example_mask=None):
        loss = adpit_loss(pred_vectors, targets, example_mask)
        return loss, {"adpit": loss}


def decode_multi_accdoa_to_grid_jnp(
    vectors,
    n_el: int = 18,
    n_az: int = 36,
    num_classes: int = 14,
    activity_threshold: float = 0.5,
):
    """Jit-friendly (..., N, C_events, 3) -> (..., G) int8 class grid:
    every active track paints its class, so same-class overlapping
    sources land in multiple cells; when different classes decode into
    one cell the highest class index wins.

    Exactly decode_vote_grid_jnp over the {0, 1} class-activity map —
    one shared implementation of the norm/angle/cell math
    (multi_accdoa_class_activity_jnp) serves both the plain decode and
    the TTA vote path (tests/test_tta.py pins their identity)."""
    activity = multi_accdoa_class_activity_jnp(
        vectors, n_el, n_az, activity_threshold
    )
    return decode_vote_grid_jnp(activity, num_classes)


def multi_accdoa_class_activity_jnp(
    vectors,
    n_el: int = 18,
    n_az: int = 36,
    activity_threshold: float = 0.5,
):
    """Jit-friendly (..., N, C_events, 3) -> (..., C_events, G) f32 in
    {0, 1}: per-class cell activity (1 where some active track of that
    class decodes into the cell). The track axis is reduced away (max),
    which is exactly what makes this representation averageable across
    ACS test-time-augmentation views — track ORDER is arbitrary per
    forward pass, but the set of (class, cell) activations is not
    (seld_tpu/tta.py kind="multi_accdoa")."""
    vectors32 = vectors.astype(jnp.float32)
    norm = jnp.linalg.norm(vectors32, axis=-1)  # (..., N, C)
    active = norm > activity_threshold
    az = jnp.rad2deg(jnp.arctan2(vectors32[..., 1], vectors32[..., 0]))
    el = jnp.rad2deg(
        jnp.arcsin(jnp.clip(vectors32[..., 2] / jnp.maximum(norm, 1e-9), -1, 1))
    )
    i, j = polar_to_grid(az, el, n_el, n_az, xp=jnp)
    cells = cell_index(i, j, n_az)  # (..., N, C)
    onehot = jax.nn.one_hot(cells, n_el * n_az, dtype=jnp.float32)
    painted = onehot * active[..., None]  # (..., N, C, G)
    return jnp.max(painted, axis=-3)  # (..., C, G)


def decode_vote_grid_jnp(
    votes,
    num_classes: int = 14,
    min_vote: float = 0.5,
):
    """(..., C_events, G) per-class cell votes in [0, 1] -> (..., G) int8
    argmax-style class grid: a cell is active iff its best class reaches
    `min_vote` (majority across TTA views, ties counting as majority);
    among tied classes the HIGHEST class index wins — the same
    tie-break as decode_multi_accdoa_to_grid_jnp, so identity-only TTA
    reproduces the plain decode bit-for-bit."""
    votes = votes.astype(jnp.float32)
    c = votes.shape[-2]
    rev = votes[..., ::-1, :]  # argmax picks the FIRST max -> highest class
    winner = (c - 1) - jnp.argmax(rev, axis=-2)  # (..., G)
    best = jnp.max(votes, axis=-2)
    return jnp.where(
        best >= min_vote, winner, num_classes - 1
    ).astype(jnp.int8)


def decode_vote_grid(
    votes: np.ndarray,
    num_classes: int = 14,
    min_vote: float = 0.5,
) -> np.ndarray:
    """numpy mirror of decode_vote_grid_jnp (same majority threshold and
    highest-class tie-break) — the host-side decode for overlapped
    serving's averaged vote maps (infer.SELDPredictor._decode_avg), where
    a per-emit device dispatch would cost a tunnel round trip."""
    votes = np.asarray(votes, np.float32)
    c = votes.shape[-2]
    rev = votes[..., ::-1, :]
    winner = (c - 1) - np.argmax(rev, axis=-2)
    best = votes.max(axis=-2)
    return np.where(best >= min_vote, winner, num_classes - 1).astype(np.int8)


def decode_multi_accdoa_to_grid(
    vectors: np.ndarray,
    n_el: int = 18,
    n_az: int = 36,
    num_classes: int = 14,
    activity_threshold: float = 0.5,
) -> np.ndarray:
    """numpy variant: (..., N, C_events, 3) -> (..., G) class grid."""
    vectors = np.asarray(vectors, np.float32)
    grid = None
    for track in range(vectors.shape[-3]):
        g = decode_accdoa_to_grid(
            vectors[..., track, :, :], n_el, n_az, num_classes,
            activity_threshold,
        )
        if grid is None:
            grid = g
        else:
            bg = num_classes - 1
            grid = np.where(g != bg, g, grid)
    return grid
