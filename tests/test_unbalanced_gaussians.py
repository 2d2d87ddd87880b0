"""Unbalanced entropic OT between 1D Gaussians: closed-form value, plan
mass and plan density (Janati et al., Theorem 3 — the reference's
``tests/generators/gaussians.py:304-455`` family, re-derived in
``oracle_utils.uot_gaussian_1d``).

Discretization conventions, following the reference generator
(``tests/generators/gaussians.py:470-620``): grids on [-1, 2], weights =
normalized Gaussian samples times the total mass, cost = squared distance
(not halved), ``reg = 2 * blur**2``, ``unbalanced = reach**2``. A grid
measure approximates the continuous one with weight ``~ h * density``, so
the discrete plan approximates ``h_x * h_y * pi(x_i, y_j)``.
"""

import numpy as np
import pytest

from geomloss_tpu import ot
from oracle_utils import gaussian_grid_weights, uot_gaussian_1d

N, M = 96, 112

pytestmark = pytest.mark.slow


CASES = [
    # mu_a, std_a, mass_a, mu_b, std_b, mass_b, blur, reach
    (0.2, 0.15, 1.0, 0.8, 0.2, 1.0, 0.3, 1.0),
    (0.0, 0.2, 0.5, 1.0, 0.12, 1.5, 0.4, 0.7),
    (0.5, 0.1, 2.0, 0.4, 0.18, 0.3, 0.25, 0.5),
    (0.3, 0.12, 0.8, 0.9, 0.15, 1.2, 0.2, 2.0),
]


def _setup(mu_a, sa, ma, mu_b, sb, mb, blur, reach):
    gx = np.linspace(-1, 2, N)
    gy = np.linspace(-1, 2, M)
    a = gaussian_grid_weights(gx, mu_a, sa, ma)
    b = gaussian_grid_weights(gy, mu_b, sb, mb)
    C = (gx[:, None] - gy[None, :]) ** 2
    oracle = uot_gaussian_1d(
        ma, mu_a, sa**2, mb, mu_b, sb**2, sigma=blur, gamma=reach**2
    )
    return gx, gy, a, b, C, oracle


@pytest.mark.parametrize("case", CASES)
def test_uot_gaussian_solve_matrix(case):
    mu_a, sa, ma, mu_b, sb, mb, blur, reach = case
    gx, gy, a, b, C, oracle = _setup(*case)

    res = ot.solve(
        C, a=a, b=b, reg=2 * blur**2, unbalanced=reach**2, max_iter=1000
    )

    # Value against the closed form (discretization error ~ h^2):
    np.testing.assert_allclose(
        float(res.value), oracle["value"], rtol=1e-2, atol=1e-3
    )

    plan = np.asarray(res.plan)
    # Total transported mass:
    np.testing.assert_allclose(plan.sum(), oracle["mass"], rtol=1e-2)

    # Pointwise plan density, modulo the grid quadrature weights:
    h = (gx[1] - gx[0]) * (gy[1] - gy[0])
    expected = h * oracle["plan"](gx, gy)
    np.testing.assert_allclose(plan, expected, atol=1e-2 * expected.max())

    # Marginals must agree with the closed-form plan's marginals (they are
    # *not* the inputs in the unbalanced case):
    np.testing.assert_allclose(
        np.asarray(res.marginal_a), expected.sum(-1),
        atol=2e-2 * expected.sum(-1).max(),
    )
    np.testing.assert_allclose(
        np.asarray(res.marginal_b), expected.sum(-2),
        atol=2e-2 * expected.sum(-2).max(),
    )


@pytest.mark.parametrize("case", CASES[:2])
def test_uot_gaussian_solve_sample(case):
    mu_a, sa, ma, mu_b, sb, mb, blur, reach = case
    gx, gy, a, b, C, oracle = _setup(*case)

    res = ot.solve_sample(
        X_a=gx[:, None],
        X_b=gy[:, None],
        a=a,
        b=b,
        reg=2 * blur**2,
        unbalanced=reach**2,
        max_iter=1000,
    )
    np.testing.assert_allclose(
        float(res.value), oracle["value"], rtol=1e-2, atol=1e-3
    )
    plan = np.asarray(res.plan)
    np.testing.assert_allclose(plan.sum(), oracle["mass"], rtol=1e-2)


def test_uot_gaussian_balanced_limit():
    """As reach -> infinity, the unbalanced value approaches the balanced
    entropic value plus the vanishing marginal penalties."""
    mu_a, sa, mu_b, sb, blur = 0.2, 0.15, 0.8, 0.2, 0.3
    gx = np.linspace(-1, 2, N)
    gy = np.linspace(-1, 2, M)
    a = gaussian_grid_weights(gx, mu_a, sa, 1.0)
    b = gaussian_grid_weights(gy, mu_b, sb, 1.0)
    C = (gx[:, None] - gy[None, :]) ** 2

    res_bal = ot.solve(C, a=a, b=b, reg=2 * blur**2, max_iter=1000)
    res_ub = ot.solve(
        C, a=a, b=b, reg=2 * blur**2, unbalanced=100.0**2, max_iter=1000
    )
    np.testing.assert_allclose(
        float(res_ub.value), float(res_bal.value), rtol=2e-2
    )
