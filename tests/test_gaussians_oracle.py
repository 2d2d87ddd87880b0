"""Closed-form Gaussian oracles (Janati et al., NeurIPS 2020): entropic OT
between 1D Gaussians sampled on regular grids has analytic value, plan and
marginals. This mirrors the reference's strongest correctness suite
(tests/generators/gaussians.py) with deterministic parameters.

Conventions (as in the reference generator):
  * grid on [-1, 2], cost = squared distance (NOT halved),
  * reg = eps = 2 * blur**2,
  * expected value = (m_a - m_b)^2 + Bures_sigma(A, B).
"""

import numpy as np
import pytest

from geomloss_tpu import ot


def _gaussian_weights(grid, mean, var):
    w = np.exp(-0.5 * (grid - mean) ** 2 / var)
    return w / w.sum()


def _bures_sigma(A, B, sigma):
    """Entropy-regularized squared Bures distance between 1D covariances
    (Janati et al., Eq. 14; d = 1)."""
    s2 = sigma**2
    D_s = np.sqrt(4 * A * B + sigma**4)
    return A + B - D_s + s2 * (1 - np.log(2 * s2)) + s2 * np.log(D_s + s2)


def _ot_sigma(ma, A, mb, B, sigma):
    """Entropy-regularized squared Wasserstein distance (Eq. 13; d = 1)."""
    return (ma - mb) ** 2 + _bures_sigma(A, B, sigma)


def _plan_sigma(grid_x, grid_y, ma, A, mb, B, sigma):
    """Entropic plan: 2D Gaussian with covariance [[A, C], [C, B]],
    C = D_sigma / 2 - sigma^2 / 2 (Eq. 15; d = 1), sampled on the grid."""
    D_s = np.sqrt(4 * A * B + sigma**4)
    C_s = 0.5 * D_s - 0.5 * sigma**2
    cov = np.array([[A, C_s], [C_s, B]])
    sens = np.linalg.inv(cov)
    X, Y = np.meshgrid(grid_x - ma, grid_y - mb, indexing="ij")
    quad = (
        sens[0, 0] * X**2 + 2 * sens[0, 1] * X * Y + sens[1, 1] * Y**2
    )
    w = np.exp(-0.5 * quad)
    return w / w.sum()


CASES = [
    # (mean_a, std_a, mean_b, std_b, blur)
    (0.2, 0.15, 0.8, 0.2, 0.3),
    (0.0, 0.2, 1.0, 0.1, 0.5),
    (0.5, 0.18, 0.5, 0.12, 0.2),
]


@pytest.mark.parametrize("ma,sa,mb,sb,blur", CASES)
def test_entropic_gaussian_value_plan_marginals(ma, sa, mb, sb, blur):
    N, M = 54, 57
    gx = np.linspace(-1, 2, N)
    gy = np.linspace(-1, 2, M)
    a = _gaussian_weights(gx, ma, sa**2)
    b = _gaussian_weights(gy, mb, sb**2)
    C = (gx[:, None] - gy[None, :]) ** 2

    res = ot.solve(
        C=C.tolist(), a=a.tolist(), b=b.tolist(),
        reg=2 * blur**2, max_iter=1000,
    )

    expected_value = _ot_sigma(ma, sa**2, mb, sb**2, blur)
    np.testing.assert_allclose(float(res.value), expected_value, atol=1e-2, rtol=1e-2)

    expected_plan = _plan_sigma(gx, gy, ma, sa**2, mb, sb**2, blur)
    np.testing.assert_allclose(np.asarray(res.plan), expected_plan, atol=1e-3)

    np.testing.assert_allclose(np.asarray(res.marginal_a), a, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.marginal_b), b, atol=1e-2)


def test_bures_limit_small_blur():
    # blur -> 0: the value tends to the exact squared Bures-Wasserstein
    # distance (ma - mb)^2 + (sa - sb)^2 in 1D.
    ma, sa, mb, sb = 0.3, 0.15, 0.75, 0.1
    N = 60
    gx = np.linspace(-1, 2, N)
    a = _gaussian_weights(gx, ma, sa**2)
    b = _gaussian_weights(gx, mb, sb**2)
    C = (gx[:, None] - gx[None, :]) ** 2

    res = ot.solve(C=C.tolist(), a=a.tolist(), b=b.tolist(), reg=1e-4, max_iter=1000)
    exact = (ma - mb) ** 2 + (sa - sb) ** 2
    np.testing.assert_allclose(float(res.value), exact, atol=1e-2, rtol=1e-2)


def test_entropic_gaussian_solve_sample():
    # Same oracle through ot.solve_sample (cost = |x - y|^2, 1D points):
    ma, sa, mb, sb, blur = 0.25, 0.15, 0.7, 0.18, 0.3
    N, M = 55, 52
    gx = np.linspace(-1, 2, N)
    gy = np.linspace(-1, 2, M)
    a = _gaussian_weights(gx, ma, sa**2)
    b = _gaussian_weights(gy, mb, sb**2)

    res = ot.solve_sample(
        X_a=gx[:, None].tolist(), X_b=gy[:, None].tolist(),
        a=a.tolist(), b=b.tolist(),
        reg=2 * blur**2, max_iter=1000,
    )
    expected_value = _ot_sigma(ma, sa**2, mb, sb**2, blur)
    np.testing.assert_allclose(float(res.value), expected_value, atol=1e-2, rtol=1e-2)
