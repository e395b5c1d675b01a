"""Spatial-grid geometry: vectorized polar -> grid-cell mapping.

Parity contract (ref: utils.py:77-90): azimuth phi in [-180, 180] and
elevation theta in [-90, 90] are normalized to [0, 1], scaled by the grid
dims, floored, and clipped to [0, dim-1]:

    j = clip(floor((phi + 180) / 360 * J), 0, J - 1)
    i = clip(floor((theta + 90) / 180 * I), 0, I - 1)

The reference applies `int(...)` to a possibly-negative float, which
truncates toward zero; because the clip lower bound is 0 the composite
behavior is identical to floor+clip for all inputs (for x < 0 both paths
clip to 0; for x >= 0 trunc == floor). We use floor+clip, which vectorizes.

Everything here is pure array math usable from numpy (host-side data prep)
or jax.numpy (inside jit).
"""

from __future__ import annotations

import numpy as np


def polar_to_grid(phi, theta, n_el: int, n_az: int, xp=np):
    """Vectorized (azimuth, elevation) -> (i, j) grid indices.

    Args:
      phi: azimuth degrees in [-180, 180], any array shape.
      theta: elevation degrees in [-90, 90], same shape.
      n_el: number of elevation rows (I in the reference, 18 for 10-deg cells).
      n_az: number of azimuth columns (J, 36).
      xp: array namespace — numpy or jax.numpy.

    Returns:
      (i, j) int32 arrays with i in [0, n_el), j in [0, n_az).
    """
    phi = xp.asarray(phi, dtype=xp.float32)
    theta = xp.asarray(theta, dtype=xp.float32)
    phi_norm = (phi + 180.0) / 360.0
    theta_norm = (theta + 90.0) / 180.0
    j = xp.clip(xp.floor(phi_norm * n_az), 0, n_az - 1).astype(xp.int32)
    i = xp.clip(xp.floor(theta_norm * n_el), 0, n_el - 1).astype(xp.int32)
    return i, j


def cell_index(i, j, n_az: int):
    """Flatten (i, j) to the 1-D cell index used by targets/models
    (ref: dataset.py:106 — cell_idx = i * J + j)."""
    return i * n_az + j


def cell_centers(n_el: int, n_az: int, xp=np):
    """Center coordinates (elevation_deg, azimuth_deg) of each grid cell.

    ref: smrl_seld_gaussian.py:489-495 —
      elevation = -90 + (i + 0.5) * (180 / I)
      azimuth   = -180 + (j + 0.5) * (360 / J)

    Returns (el[n_el], az[n_az]) float32 vectors.
    """
    el = -90.0 + (xp.arange(n_el, dtype=xp.float32) + 0.5) * (180.0 / n_el)
    az = -180.0 + (xp.arange(n_az, dtype=xp.float32) + 0.5) * (360.0 / n_az)
    return el, az


def wrap_angle_diff(a, b, xp=np):
    """Shortest signed angular distance a - b, wrapped into (-180, 180].

    Vectorized equivalent of the reference's while-loop normalizer
    (ref: smrl_seld_gaussian.py:500-507).
    """
    diff = xp.asarray(a, dtype=xp.float32) - xp.asarray(b, dtype=xp.float32)
    return (diff + 180.0) % 360.0 - 180.0
