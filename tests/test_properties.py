"""Property-based tests (hypothesis) for the pure math at the bottom of
the stack — invariants that must hold for ALL inputs, complementing the
golden-value tests."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from seld_tpu.eval.metrics import dcase2022_metrics, seld_metrics
from seld_tpu.grid import cell_index, polar_to_grid
from seld_tpu.targets.rasterize import decode_class_bitmask

SETTINGS = settings(max_examples=60, deadline=None)


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.floats(-180.0, 180.0, allow_nan=False),
            st.floats(-90.0, 90.0, allow_nan=False),
        ),
        min_size=1, max_size=40,
    ),
    st.integers(2, 36), st.integers(2, 72),
)
def test_polar_to_grid_bounds_and_reference_formula(points, n_el, n_az):
    az = np.array([p[0] for p in points], np.float32)
    el = np.array([p[1] for p in points], np.float32)
    i, j = polar_to_grid(az, el, n_el, n_az)
    assert ((0 <= i) & (i < n_el)).all()
    assert ((0 <= j) & (j < n_az)).all()
    # the reference's scalar formula (ref utils.py:77-90), restated
    for k in range(len(points)):
        jj = min(max(int(np.float32((az[k] + 180.0) / 360.0) * n_az // 1), 0),
                 n_az - 1)
        ii = min(max(int(np.float32((el[k] + 90.0) / 180.0) * n_el // 1), 0),
                 n_el - 1)
        assert (int(i[k]), int(j[k])) == (ii, jj)
    flat = cell_index(i, j, n_az)
    assert ((0 <= flat) & (flat < n_el * n_az)).all()


@SETTINGS
@given(st.data())
def test_bitmask_decode_matches_direct_onehot(data):
    num_classes = data.draw(st.integers(2, 16))
    t, g = data.draw(st.integers(1, 6)), data.draw(st.integers(1, 30))
    mask = data.draw(
        st.lists(
            st.lists(st.integers(0, 2 ** num_classes - 1),
                     min_size=g, max_size=g),
            min_size=t, max_size=t,
        )
    )
    mask = np.asarray(mask, np.uint16 if num_classes <= 16 else np.uint32)
    onehot = np.asarray(decode_class_bitmask(mask, num_classes))
    # documented semantics: bits 0..num_classes-2 are event classes;
    # the LAST class (background) is 1 iff no event bit is set
    # (ref dataset.py:113-117)
    for ti in range(t):
        for gi in range(g):
            v = int(mask[ti, gi])
            for c in range(num_classes - 1):
                assert onehot[ti, gi, c] == ((v >> c) & 1)
            assert onehot[ti, gi, num_classes - 1] == (1.0 if v == 0 else 0.0)


def _random_grid(rng, n=2, t=60, g=648, num_classes=14, density=0.02):
    grid = np.full((n, t, g), num_classes - 1, np.int8)
    hits = rng.random((n, t, g)) < density
    grid[hits] = rng.integers(0, num_classes - 1, hits.sum())
    return grid


@SETTINGS
@given(st.integers(0, 2 ** 31 - 1))
def test_dcase2022_perfect_prediction_identities(seed):
    rng = np.random.default_rng(seed)
    grid = _random_grid(rng)
    m = dcase2022_metrics(grid, grid)
    if m["Nref"] > 0:
        assert m["ER"] == 0.0
        assert abs(m["F_macro"] - 1.0) < 1e-9
        # identical DOA sets: distance is arccos(clip(cos)) float fuzz
        assert m["LE_macro"] < 1e-3
        assert abs(m["LR_macro"] - 1.0) < 1e-9
        assert m["SELD_error"] < 1e-3
    frame = seld_metrics(grid, grid)
    assert frame["ER"] == 0.0 and frame["LE"] < 1e-3


@SETTINGS
@given(st.integers(0, 2 ** 31 - 1))
def test_dcase2022_empty_prediction_identities(seed):
    rng = np.random.default_rng(seed)
    grid = _random_grid(rng, density=0.05)
    empty = np.full_like(grid, 13)
    m = dcase2022_metrics(empty, grid)
    if m["Nref"] > 0:
        # nothing detected: no recall, every GT segment a deletion
        assert m["LR_macro"] == 0.0 and m["F_macro"] == 0.0
        assert m["ER"] == 1.0  # D = Nref, S = I = 0
        assert m["LE_macro"] == 180.0  # convention for never-detected


@SETTINGS
@given(st.integers(0, 10_000_000), st.integers(1, 4096))
def test_num_stft_frames_covers_signal(n_samples, hop):
    from seld_tpu.features.mel import num_stft_frames

    t = num_stft_frames(n_samples, hop)
    # every sample index falls inside some frame's hop slot, and frame
    # starts never run past the (center-padded) signal
    assert (t - 1) * hop <= n_samples < t * hop + hop


@SETTINGS
@given(st.integers(2, 36), st.integers(2, 72))
def test_cell_centers_roundtrip_through_polar_to_grid(n_el, n_az):
    """Every cell's center must map back to that cell — the geometric
    consistency predict/serving relies on when emitting event rows."""
    from seld_tpu.grid import cell_centers

    el, az = cell_centers(n_el, n_az)
    ii, jj = np.meshgrid(np.arange(n_el), np.arange(n_az), indexing="ij")
    i2, j2 = polar_to_grid(
        np.broadcast_to(az[None, :], (n_el, n_az)),
        np.broadcast_to(el[:, None], (n_el, n_az)),
        n_el, n_az,
    )
    np.testing.assert_array_equal(np.asarray(i2), ii)
    np.testing.assert_array_equal(np.asarray(j2), jj)


@SETTINGS
@given(st.integers(0, 2 ** 31 - 1))
def test_to_metadata_rows_vote_semantics(seed):
    """to_metadata_rows emits (metaframe, class, cell) iff the class is
    active in that cell in >= 3 of the metaframe's 5 label frames — the
    inverse of the rasterizer's 5x fanout (ref dataset.py:67-70)."""
    from seld_tpu.grid import cell_centers, polar_to_grid
    from seld_tpu.infer import Prediction

    rng = np.random.default_rng(seed)
    n_el, n_az, num_classes = 18, 36, 14
    t, g = 15, n_el * n_az  # 3 metadata frames
    classes = np.full((t, g), num_classes - 1, np.int8)
    hits = rng.random((t, g)) < 0.01
    classes[hits] = rng.integers(0, num_classes - 1, hits.sum())
    pred = Prediction(classes=classes, n_el=n_el, n_az=n_az,
                      num_classes=num_classes)
    rows = pred.to_metadata_rows(min_votes=3)

    # oracle: brute-force vote count per (metaframe, cell, class)
    expected = set()
    for mf in range(3):
        block = classes[mf * 5 : (mf + 1) * 5]
        for c in range(g):
            vals, counts = np.unique(block[:, c], return_counts=True)
            for v, n in zip(vals, counts):
                if v != num_classes - 1 and n >= 3:
                    expected.add((mf, int(v), c))
    got = set()
    el, az = cell_centers(n_el, n_az)
    for mf, cls, _src, a, e in rows:
        i, j = polar_to_grid(np.float32(a), np.float32(e), n_el, n_az)
        got.add((int(mf), int(cls), int(i) * n_az + int(j)))
    assert got == expected


def test_metrics_on_empty_ground_truth_do_not_crash():
    """Nref=0 (silence vs silence): defined values, no division blowups."""
    empty = np.full((2, 60, 648), 13, np.int8)
    m = dcase2022_metrics(empty, empty)
    assert m["Nref"] == 0 and np.isfinite(m["ER"])
    f = seld_metrics(empty, empty)
    assert all(np.isfinite(v) for v in (f["ER"], f["F"], f["LR"]))
