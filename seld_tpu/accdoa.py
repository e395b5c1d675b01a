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
    (tanh-bounded to [-1, 1] per component)."""

    num_event_classes: int = 13
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
            self.num_event_classes * 3, name="accdoa", **kw
        )(x)
        return jnp.tanh(y.astype(jnp.float32)).reshape(
            b, t, self.num_event_classes, 3
        )


def accdoa_loss(pred_vectors, target_vectors, example_mask=None):
    """Masked MSE over the ACCDOA vectors: (B, T, C, 3) each."""
    sq = jnp.square(pred_vectors.astype(jnp.float32) - target_vectors)
    per_example = jnp.mean(sq.reshape(sq.shape[0], -1), axis=-1)
    if example_mask is None:
        return jnp.mean(per_example)
    em = example_mask.astype(jnp.float32)
    return jnp.sum(per_example * em) / jnp.sum(em)


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
