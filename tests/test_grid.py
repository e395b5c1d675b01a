"""Golden tests for grid geometry against the reference formulas
(ref: utils.py:77-90, smrl_seld_gaussian.py:489-507)."""

import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.grid import cell_centers, cell_index, polar_to_grid, wrap_angle_diff


def reference_polar_to_grid(phi, theta, I, J):
    """Literal re-statement of the reference scalar formula for golden
    comparison (ref: utils.py:85-90)."""
    phi_norm = (phi + 180.0) / 360.0
    theta_norm = (theta + 90.0) / 180.0
    j = int(np.clip(phi_norm * J, 0, J - 1))
    i = int(np.clip(theta_norm * I, 0, I - 1))
    return i, j


I, J = 18, 36


@pytest.mark.parametrize(
    "phi,theta",
    [
        (0.0, 0.0),
        (-180.0, -90.0),
        (180.0, 90.0),  # upper boundary must clip to last cell
        (179.9, 89.9),
        (-179.9, -89.9),
        (-0.01, -0.01),
        (10.0, 10.0),
        (-100.0, 45.0),
        (55.0, -37.0),
        (9.999, 9.999),  # just below a cell edge
        (170.0, 80.0),
    ],
)
def test_polar_to_grid_matches_reference(phi, theta):
    ref_i, ref_j = reference_polar_to_grid(phi, theta, I, J)
    i, j = polar_to_grid(phi, theta, I, J)
    assert (int(i), int(j)) == (ref_i, ref_j)


def test_polar_to_grid_vectorized_sweep():
    """Dense sweep: every integer degree pair must match the scalar reference."""
    phis = np.arange(-180, 181, dtype=np.float32)
    thetas = np.arange(-90, 91, dtype=np.float32)
    pg, tg = np.meshgrid(phis, thetas)
    i_vec, j_vec = polar_to_grid(pg.ravel(), tg.ravel(), I, J)
    for k in range(0, pg.size, 97):  # stride sample of the full sweep
        ri, rj = reference_polar_to_grid(pg.ravel()[k], tg.ravel()[k], I, J)
        assert i_vec[k] == ri and j_vec[k] == rj


def test_polar_to_grid_jnp_matches_numpy():
    phis = np.linspace(-180, 180, 73).astype(np.float32)
    thetas = np.linspace(-90, 90, 73).astype(np.float32)
    i_np, j_np = polar_to_grid(phis, thetas, I, J, xp=np)
    i_jnp, j_jnp = polar_to_grid(phis, thetas, I, J, xp=jnp)
    np.testing.assert_array_equal(i_np, np.asarray(i_jnp))
    np.testing.assert_array_equal(j_np, np.asarray(j_jnp))


def test_cell_index_flattening():
    assert cell_index(0, 0, J) == 0
    assert cell_index(1, 0, J) == 36
    assert cell_index(17, 35, J) == 647  # last cell of 18x36


def test_cell_centers_match_reference_formula():
    el, az = cell_centers(I, J)
    # ref smrl_seld_gaussian.py:494-495
    assert el[0] == pytest.approx(-90 + 0.5 * 10.0)
    assert el[-1] == pytest.approx(-90 + 17.5 * 10.0)
    assert az[0] == pytest.approx(-180 + 0.5 * 10.0)
    assert az[-1] == pytest.approx(-180 + 35.5 * 10.0)


def reference_normalize_azimuth_diff(az1, az2):
    """ref: smrl_seld_gaussian.py:500-507"""
    diff = az1 - az2
    while diff > 180:
        diff -= 360
    while diff < -180:
        diff += 360
    return diff


@pytest.mark.parametrize(
    "a,b", [(170, -170), (-170, 170), (0, 359), (10, 20), (355, 5), (720, 0), (-540, 0)]
)
def test_wrap_angle_diff_abs_matches_reference(a, b):
    # The reference only consumes abs() of the wrapped diff
    # (smrl_seld_gaussian.py:510); match on that contract.
    ref = abs(reference_normalize_azimuth_diff(a, b))
    got = abs(float(wrap_angle_diff(a, b)))
    assert got == pytest.approx(ref)
