"""Closed-form lattice identities (SURVEY §7 build order item 1)."""
import numpy as np

from tpulbm.lattice import D2Q9, D3Q19


def test_d2q9_matches_reference_constants():
    # Reference LBMConfig.h:13-34.
    assert D2Q9.Q == 9 and D2Q9.D == 2
    assert D2Q9.velocities == (
        (0, 0), (1, 0), (0, 1), (-1, 0), (0, -1),
        (1, 1), (-1, 1), (-1, -1), (1, -1))
    np.testing.assert_allclose(
        D2Q9.w, [4 / 9, 1 / 9, 1 / 9, 1 / 9, 1 / 9, 1 / 36, 1 / 36, 1 / 36, 1 / 36])
    np.testing.assert_array_equal(D2Q9.opposite, [0, 3, 4, 1, 2, 7, 8, 5, 6])


def _check_quadrature(lat):
    w, c = lat.w, lat.c.astype(np.float64)
    assert abs(w.sum() - 1.0) < 1e-14
    # First moment zero
    np.testing.assert_allclose(w @ c, 0.0, atol=1e-14)
    # Second moment isotropy: sum_i w_i c_ia c_ib = cs^2 delta_ab
    second = np.einsum("i,ia,ib->ab", w, c, c)
    np.testing.assert_allclose(second, np.eye(lat.D) / 3.0, atol=1e-14)


def test_quadrature_d2q9():
    _check_quadrature(D2Q9)


def test_quadrature_d3q19():
    assert D3Q19.Q == 19 and D3Q19.D == 3
    _check_quadrature(D3Q19)
    # opposite is involutive and correct
    opp = D3Q19.opposite
    for i in range(19):
        np.testing.assert_array_equal(D3Q19.c[opp[i]], -D3Q19.c[i])
        assert opp[opp[i]] == i
