"""Gaussian spatial label augmentation, vectorized.

Parity contract (ref: smrl_seld_gaussian.py:397-535):
  * each unique source, keyed by (class, source_num), draws ONE fixed
    (azimuth, elevation) displacement ~ N(0, sigma) reused for every frame
    of that source (ref: :429-440);
  * for each metadata row, the displaced center defines a 2-sigma
    rectangular region in angular space; a grid cell belongs to the region
    iff |shortest_angular_diff(cell_az_center, center_az)| <= 2*sigma_az
    (azimuth wraparound, ref: :499-511) and the cell's elevation center
    lies inside [max(center_el - 2*sigma_el, -90), min(center_el +
    2*sigma_el, 90)] (ref: :479-481, 513-514);
  * all member cells get a hard 1.0 label for the row's class over its 5
    fanned-out frames (ref: :520-526); background fills untouched cells.

TPU-native redesign: the reference scans all 648 cells in Python per
metadata row (O(rows x I x J) interpreter work). Here region membership is
a single broadcast comparison over (rows, I, J) and the label write is a
vectorized scatter-or into the same uint16 class-bitmask storage used for
point targets.

Determinism: the reference draws noise from the global numpy RNG in
pandas-groupby order (sorted by (class, source)) — irreproducible across
runs. seld_tpu keys the noise on (seed, file_key, class, source) with a
counter-based RNG (jax-style philox via numpy Generator seeded per source)
so augmentation is deterministic-but-random per source and independent of
iteration order (SURVEY §7 hard part (g)).
"""

from __future__ import annotations

import numpy as np

from seld_tpu.grid import cell_centers, wrap_angle_diff
from seld_tpu.targets.rasterize import bitmask_to_dense


def draw_source_noise(
    classes: np.ndarray,
    sources: np.ndarray,
    sigma_azimuth: float = 5.0,
    sigma_elevation: float = 5.0,
    seed: int = 0,
    file_key: int = 0,
) -> dict[tuple[int, int], tuple[float, float]]:
    """One fixed (az, el) Gaussian displacement per unique (class, source).

    Deterministic: seeded per (seed, file_key, class, source) so results
    do not depend on row order or on how many sources other files drew
    (unlike ref smrl_seld_gaussian.py:432-440 which advances one global RNG).
    """
    noise = {}
    pairs = sorted({(int(c), int(s)) for c, s in zip(classes, sources)})
    for c, s in pairs:
        g = np.random.default_rng(np.array([seed, file_key, c, s], dtype=np.uint64))
        az_noise = g.normal(0.0, sigma_azimuth)
        el_noise = g.normal(0.0, sigma_elevation)
        noise[(c, s)] = (float(az_noise), float(el_noise))
    return noise


def gaussian_region_mask(
    center_az: np.ndarray,
    center_el: np.ndarray,
    sigma_azimuth: float,
    sigma_elevation: float,
    n_el: int = 18,
    n_az: int = 36,
) -> np.ndarray:
    """Region membership for each row: (R, n_el * n_az) bool.

    Vectorized form of the reference's per-cell scan
    (ref: smrl_seld_gaussian.py:485-518).
    """
    center_az = np.asarray(center_az, dtype=np.float64)[:, None, None]  # (R,1,1)
    center_el = np.asarray(center_el, dtype=np.float64)[:, None, None]
    cell_el, cell_az = cell_centers(n_el, n_az)  # (I,), (J,)
    cell_el = cell_el[None, :, None]  # (1,I,1)
    cell_az = cell_az[None, None, :]  # (1,1,J)

    az_dist = np.abs(wrap_angle_diff(cell_az, center_az))
    az_in = az_dist <= 2.0 * sigma_azimuth  # ref :510-511

    # Elevation bounds are clipped to [-90, 90] BEFORE the range check
    # (ref :479-481); since cell centers always lie inside (-90, 90) the
    # clip only matters at exact +/-90 bounds, but we reproduce it exactly.
    el_min = np.maximum(center_el - 2.0 * sigma_elevation, -90.0)
    el_max = np.minimum(center_el + 2.0 * sigma_elevation, 90.0)
    el_in = (cell_el >= el_min) & (cell_el <= el_max)  # ref :513-514

    return (az_in & el_in).reshape(center_az.shape[0], n_el * n_az)


def rasterize_gaussian_labels(
    frames: np.ndarray,
    classes: np.ndarray,
    sources: np.ndarray,
    azimuths: np.ndarray,
    elevations: np.ndarray,
    total_frames: int,
    n_el: int = 18,
    n_az: int = 36,
    num_classes: int = 14,
    fanout: int = 5,
    sigma_azimuth: float = 5.0,
    sigma_elevation: float = 5.0,
    seed: int = 0,
    file_key: int = 0,
    source_noise: dict | None = None,
    return_dense: bool = True,
):
    """Gaussian-region labels as a (T, G) uint16 bitmask (and optionally the
    dense decode). `source_noise` may be injected for golden tests."""
    mask = np.zeros((total_frames, n_el * n_az), dtype=np.uint16)
    frames = np.asarray(frames, dtype=np.int64)
    classes = np.asarray(classes, dtype=np.int64)
    if len(frames):
        if source_noise is None:
            source_noise = draw_source_noise(
                classes, sources, sigma_azimuth, sigma_elevation, seed, file_key
            )
        noise = np.array(
            [source_noise[(int(c), int(s))] for c, s in zip(classes, sources)],
            dtype=np.float64,
        )  # (R, 2) az/el
        center_az = np.asarray(azimuths, np.float64) + noise[:, 0]
        center_el = np.asarray(elevations, np.float64) + noise[:, 1]

        region = gaussian_region_mask(
            center_az, center_el, sigma_azimuth, sigma_elevation, n_el, n_az
        )  # (R, G)

        rows_idx, cells_idx = np.nonzero(region)
        bits = (1 << classes[rows_idx]).astype(np.uint16)
        base = frames[rows_idx] * fanout
        for o in range(fanout):
            t = base + o
            valid = t < total_frames
            np.bitwise_or.at(mask, (t[valid], cells_idx[valid]), bits[valid])

    if return_dense:
        return bitmask_to_dense(mask, num_classes)
    return mask
