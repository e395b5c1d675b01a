"""Golden tests for label rasterization + Gaussian augmentation against
literal re-statements of the reference algorithms (ref: dataset.py:60-119,
smrl_seld_gaussian.py:397-535)."""

import numpy as np
import pytest

from seld_tpu.grid import polar_to_grid
from seld_tpu.targets import (
    bitmask_to_dense,
    decode_class_bitmask,
    encode_events_to_bitmask,
    rasterize_gaussian_labels,
    rasterize_point_labels,
    total_label_frames,
)

I, J, M, FANOUT = 18, 36, 14, 5


def reference_point_labels(rows, total_frames):
    """Literal port of ref dataset.py:83-119 (loop semantics) as the oracle."""
    labels = np.zeros((total_frames, I * J, M), dtype=np.float32)
    active = [set() for _ in range(total_frames)]
    for frame, cls, _src, az, el in rows:
        start = frame * FANOUT
        end = min(start + FANOUT, total_frames)
        i, j = polar_to_grid(float(az), float(el), I, J)
        cell = int(i) * J + int(j)
        for t in range(start, end):
            labels[t, cell, cls] = 1.0
            active[t].add(cell)
    for t in range(total_frames):
        for cell in range(I * J):
            if cell not in active[t]:
                labels[t, cell, M - 1] = 1.0
    return labels


def random_rows(rng, n_rows, max_frame):
    frames = rng.integers(0, max_frame, n_rows)
    classes = rng.integers(0, 13, n_rows)
    sources = rng.integers(0, 4, n_rows)
    az = rng.integers(-180, 181, n_rows)
    el = rng.integers(-90, 91, n_rows)
    return frames, classes, sources, az, el


def test_total_label_frames():
    # 60 s at 24 kHz -> 3000 frames of 20 ms (ref dataset.py:73)
    assert total_label_frames(60 * 24000, 24000) == 3000
    # truncation: 1.01 s -> 50 frames
    assert total_label_frames(int(1.01 * 24000), 24000) == 50


def test_point_labels_match_reference(rng):
    total_frames = 40
    frames, classes, sources, az, el = random_rows(rng, 64, max_frame=9)
    rows = list(zip(frames, classes, sources, az, el))
    ref = reference_point_labels(rows, total_frames)
    got = rasterize_point_labels(frames, classes, az, el, total_frames, I, J, M)
    np.testing.assert_array_equal(got, ref)


def test_point_labels_fanout_clipped_at_end(rng):
    # A metadata frame whose fanout extends past total_frames must clip
    # (ref dataset.py:103).
    total_frames = 12  # metadata frame 2 -> label frames 10..14 clipped to 10,11
    got = rasterize_point_labels(
        np.array([2]), np.array([5]), np.array([0]), np.array([0]), total_frames, I, J, M
    )
    i, j = polar_to_grid(0.0, 0.0, I, J)
    cell = int(i) * J + int(j)
    assert got[10, cell, 5] == 1.0 and got[11, cell, 5] == 1.0
    assert got[9, cell, 5] == 0.0
    assert got[9, cell, M - 1] == 1.0  # background before the event


def test_multi_class_same_cell():
    # Two classes at the same location and frame: both hot, background off
    # (ref dataset.py:109-117 — multi-hot cells are possible).
    got = rasterize_point_labels(
        np.array([0, 0]),
        np.array([3, 7]),
        np.array([10, 10]),
        np.array([20, 20]),
        total_frames=5,
    )
    i, j = polar_to_grid(10.0, 20.0, I, J)
    cell = int(i) * J + int(j)
    assert got[0, cell, 3] == 1.0 and got[0, cell, 7] == 1.0
    assert got[0, cell, M - 1] == 0.0


def test_background_everywhere_with_no_events():
    got = rasterize_point_labels(
        np.zeros(0), np.zeros(0), np.zeros(0), np.zeros(0), total_frames=3
    )
    assert (got[..., M - 1] == 1.0).all()
    assert (got[..., : M - 1] == 0.0).all()


def test_bitmask_roundtrip_and_device_decoder(rng):
    total_frames = 25
    frames, classes, sources, az, el = random_rows(rng, 40, max_frame=4)
    mask = encode_events_to_bitmask(frames, classes, az, el, total_frames)
    dense_np = bitmask_to_dense(mask)
    dense_dev = np.asarray(decode_class_bitmask(np.asarray(mask)))
    np.testing.assert_array_equal(dense_np, dense_dev)


# ---------------------------------------------------------------------------
# Gaussian augmentation


def reference_gaussian_labels(rows, total_frames, source_noise, sig_az=5.0, sig_el=5.0):
    """Literal port of ref smrl_seld_gaussian.py:442-534 with injected
    per-source noise (the reference draws from the global RNG)."""
    labels = np.zeros((total_frames, I * J, M), dtype=np.float32)
    active = [set() for _ in range(total_frames)]

    def normalize_azimuth_diff(az1, az2):
        diff = az1 - az2
        while diff > 180:
            diff -= 360
        while diff < -180:
            diff += 360
        return diff

    for frame, cls, src, az, el in rows:
        az_noise, el_noise = source_noise[(int(cls), int(src))]
        start = frame * FANOUT
        end = min(start + FANOUT, total_frames)
        center_az = az + az_noise
        center_el = el + el_noise
        el_min = max(center_el - 2 * sig_el, -90)
        el_max = min(center_el + 2 * sig_el, 90)
        affected = set()
        for gi in range(I):
            for gj in range(J):
                cell_el = -90 + (gi + 0.5) * (180.0 / I)
                cell_az = -180 + (gj + 0.5) * (360.0 / J)
                az_dist = abs(normalize_azimuth_diff(cell_az, center_az))
                if az_dist <= 2 * sig_az and el_min <= cell_el <= el_max:
                    affected.add(gi * J + gj)
        for cell in affected:
            for t in range(start, end):
                labels[t, cell, cls] = 1.0
                active[t].add(cell)
    for t in range(total_frames):
        for cell in range(I * J):
            if cell not in active[t]:
                labels[t, cell, M - 1] = 1.0
    return labels


def test_gaussian_labels_match_reference(rng):
    total_frames = 30
    frames, classes, sources, az, el = random_rows(rng, 24, max_frame=6)
    rows = list(zip(frames, classes, sources, az, el))
    noise = {
        (int(c), int(s)): (float(rng.normal(0, 5)), float(rng.normal(0, 5)))
        for c, s in {(int(c), int(s)) for c, s in zip(classes, sources)}
    }
    ref = reference_gaussian_labels(rows, total_frames, noise)
    got = rasterize_gaussian_labels(
        frames, classes, sources, az, el, total_frames, source_noise=noise
    )
    np.testing.assert_array_equal(got, ref)


def test_gaussian_wraparound_at_dateline():
    # A source at azimuth 179 with +4 deg noise wraps past 180: cells on the
    # -180 side must be painted (ref smrl_seld_gaussian.py:499-511).
    noise = {(2, 0): (4.0, 0.0)}
    got = rasterize_gaussian_labels(
        np.array([0]), np.array([2]), np.array([0]),
        np.array([179]), np.array([0]),
        total_frames=5, source_noise=noise,
    )
    # center az = 183 -> wrapped -177; region spans [-187, -167] ~ [173, -167]
    # Cell centers at az -175 (j=0) and az 175 (j=35), elevation row for el=0.
    i = 9  # el 0 -> row 9 (centers at +5)
    hot_j0 = got[0, i * J + 0, 2]
    hot_j35 = got[0, i * J + 35, 2]
    assert hot_j0 == 1.0 and hot_j35 == 1.0


def test_gaussian_augmentation_inflates_active_cells(rng):
    # The augmented labels must cover at least the point-target cells'
    # count (region >= 1 cell per row), mirroring the notebook's
    # augmentation-comparison check (ref SMR_SELD.ipynb cells 28-29).
    total_frames = 20
    frames, classes, sources, az, el = random_rows(rng, 16, max_frame=3)
    point = rasterize_point_labels(frames, classes, az, el, total_frames)
    gauss = rasterize_gaussian_labels(
        frames, classes, sources, az, el, total_frames, seed=1
    )
    point_active = (point[..., : M - 1].sum(-1) > 0).sum()
    gauss_active = (gauss[..., : M - 1].sum(-1) > 0).sum()
    assert gauss_active >= point_active


def test_gaussian_noise_is_deterministic():
    from seld_tpu.targets import draw_source_noise

    c = np.array([1, 2, 1])
    s = np.array([0, 0, 1])
    a = draw_source_noise(c, s, seed=7, file_key=3)
    b = draw_source_noise(c[::-1], s[::-1], seed=7, file_key=3)  # order-free
    assert a == b
    c2 = draw_source_noise(c, s, seed=8, file_key=3)
    assert a != c2
