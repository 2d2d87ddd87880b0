"""Oracle-based correctness tests for the ``ot.solve*`` API, modeled on the
reference's test strategy (SURVEY §4): closed-form Diracs, planted
permutations, scipy's exact assignment solver as ground truth, and
metamorphic symmetry/linearity properties."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from geomloss_tpu import ot


# ------------------------------------------------------------------ helpers


pytestmark = pytest.mark.slow


def _check_marginals(res, a, b, atol=1e-4):
    plan = np.asarray(res.plan)
    np.testing.assert_allclose(plan.sum(axis=-1), a, atol=atol, rtol=1e-3)
    np.testing.assert_allclose(plan.sum(axis=-2), b, atol=atol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res.marginal_a), a, atol=atol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res.marginal_b), b, atol=atol, rtol=1e-3)


# ------------------------------------------------------------------ diracs


def test_dirac_1x1():
    # OT between two Diracs of mass m: plan = [[m]] and the entropic dual
    # value is m * (C - eps * log(m)) (the reference's own 2x3 doctest
    # shows the same entropic correction: 0.997 for <plan, C> = 1).
    m, C00, eps = 2.0, 3.5, 0.1
    res = ot.solve(C=[[C00]], a=[m], b=[m], reg=eps, max_iter=50)
    np.testing.assert_allclose(
        float(res.value), m * (C00 - eps * np.log(m)), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(res.plan), [[2.0]], rtol=1e-6)
    # Potentials sum to C - eps*log(m) at the symmetric fixed point:
    f = np.asarray(res.potential_a)
    g = np.asarray(res.potential_b)
    np.testing.assert_allclose(f + g, [C00 - eps * np.log(m)], rtol=1e-6)


def test_dirac_solve_sample():
    res = ot.solve_sample(
        X_a=[[0.0, 0.0]], X_b=[[1.0, 1.0]], reg=0.05, max_iter=50
    )
    np.testing.assert_allclose(float(res.value), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.plan), [[1.0]], rtol=1e-6)


# ------------------------------------------------------- planted permutation


def test_planted_permutation():
    rng = np.random.RandomState(0)
    N = 8
    perm = rng.permutation(N)
    C = rng.rand(N, N) + 1.0
    C[np.arange(N), perm] = 0.01 * rng.rand(N)
    res = ot.solve(C=C.tolist(), reg=1e-3, max_iter=500)
    plan = np.asarray(res.plan)
    expected = np.zeros((N, N))
    expected[np.arange(N), perm] = 1.0 / N
    np.testing.assert_allclose(plan, expected, atol=1e-5)


# ------------------------------------------------- scipy assignment oracle


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_matrix_vs_scipy_assignment(seed):
    rng = np.random.RandomState(seed)
    N = 12
    C = rng.rand(N, N)
    rows, cols = linear_sum_assignment(C)
    exact = C[rows, cols].sum() / N

    res = ot.solve(C=C.tolist(), reg=1e-4, max_iter=1000)
    # The entropic value carries an O(eps * log N) correction term:
    np.testing.assert_allclose(float(res.value), exact, rtol=5e-3, atol=5e-4)
    _check_marginals(res, np.full(N, 1 / N), np.full(N, 1 / N))


def test_solve_sample_vs_scipy_assignment():
    rng = np.random.RandomState(4)
    N = 10
    x = rng.rand(N, 2)
    y = rng.rand(N, 2)
    C = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    rows, cols = linear_sum_assignment(C)
    exact = C[rows, cols].sum() / N

    res = ot.solve_sample(X_a=x.tolist(), X_b=y.tolist(), reg=1e-4, max_iter=1000)
    np.testing.assert_allclose(float(res.value), exact, rtol=5e-3, atol=5e-4)


# ------------------------------------------------------------- metamorphic


def test_symmetry():
    rng = np.random.RandomState(5)
    N, M = 7, 9
    C = rng.rand(N, M)
    a = rng.rand(N) + 0.1
    b = rng.rand(M) + 0.1
    b = b * a.sum() / b.sum()

    res_ab = ot.solve(C=C.tolist(), a=a.tolist(), b=b.tolist(), reg=0.01, max_iter=200)
    res_ba = ot.solve(
        C=C.T.tolist(), a=b.tolist(), b=a.tolist(), reg=0.01, max_iter=200
    )
    np.testing.assert_allclose(
        float(res_ab.value), float(res_ba.value), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_ab.plan), np.asarray(res_ba.plan).T, rtol=1e-6, atol=1e-10
    )


@pytest.mark.parametrize("scale", [0.1, 3.0])
def test_cost_linearity(scale):
    rng = np.random.RandomState(6)
    N, M = 6, 8
    C = rng.rand(N, M)
    res = ot.solve(C=C.tolist(), reg=0.01, max_iter=200)
    res_scaled = ot.solve(C=(scale * C).tolist(), reg=scale * 0.01, max_iter=200)
    np.testing.assert_allclose(
        float(res_scaled.value), scale * float(res.value), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_scaled.plan), np.asarray(res.plan), rtol=1e-6, atol=1e-10
    )


# -------------------------------------------------------------- solve_batch


def test_solve_batch_matches_loop_of_solves():
    rng = np.random.RandomState(7)
    B, N, M = 3, 5, 6
    C = rng.rand(B, N, M)
    res_b = ot.solve_batch(C=C.tolist(), reg=0.01, max_iter=100)
    vals = np.asarray(res_b.value)
    plans = np.asarray(res_b.plan)
    assert vals.shape == (B,)
    assert plans.shape == (B, N, M)
    # N.B.: batch mode shares a single annealing schedule computed from the
    # global max-min cost (reference matrix.py:660-665), so per-item results
    # agree only up to solver tolerance:
    for k in range(B):
        res_k = ot.solve(C=C[k].tolist(), reg=0.01, max_iter=100)
        np.testing.assert_allclose(vals[k], float(res_k.value), rtol=1e-3)
        np.testing.assert_allclose(plans[k], np.asarray(res_k.plan), atol=2e-3)


# ----------------------------------------------------------------- results


def test_result_operators_and_potentials():
    rng = np.random.RandomState(8)
    N, M = 6, 7
    C = rng.rand(N, M)
    res = ot.solve(C=C.tolist(), reg=0.01, max_iter=200)

    # plan_operator @ v == plan @ v
    v = rng.rand(M)
    via_op = np.asarray(res.plan_operator @ jnp.asarray(v))
    via_dense = np.asarray(res.plan) @ v
    np.testing.assert_allclose(via_op, via_dense, rtol=1e-6)

    # Transposed operator:
    u = rng.rand(N)
    via_op_t = np.asarray(res.plan_operator.T @ jnp.asarray(u))
    np.testing.assert_allclose(via_op_t, np.asarray(res.plan).T @ u, rtol=1e-6)

    # density == plan / (a x b):
    dens = np.asarray(res.density)
    plan = np.asarray(res.plan)
    np.testing.assert_allclose(dens * (1 / N) * (1 / M), plan, rtol=1e-6)

    assert "GeomLoss" in res.citation
    assert res.plan_operator.shape == (N, M)


def test_unbalanced_solve_runs():
    rng = np.random.RandomState(9)
    N, M = 6, 7
    C = rng.rand(N, M)
    a = rng.rand(N) + 0.5
    b = rng.rand(M) + 0.1  # different total mass
    res = ot.solve(
        C=C.tolist(), a=a.tolist(), b=b.tolist(),
        reg=0.05, unbalanced=1.0, max_iter=200,
    )
    val = float(res.value)
    assert np.isfinite(val)
    # Unbalanced marginals are pulled towards—but not equal to—a and b:
    ma = np.asarray(res.marginal_a)
    assert ma.shape == a.shape and np.all(ma >= 0)


def test_solve_sample_debias_and_streaming_consistency():
    rng = np.random.RandomState(10)
    x = rng.rand(40, 3)
    y = rng.rand(50, 3)
    res = ot.solve_sample(
        X_a=x.tolist(), X_b=y.tolist(), blur=0.1, debias=True, max_iter=100
    )
    val = float(res.value)
    assert np.isfinite(val)
    # Debiased divergence between close clouds should be small and >= ~0:
    assert val > -1e-4

    # Lazy (streaming) operators agree with dense ones:
    v = rng.rand(50)
    lazy = np.asarray(res.lazy_density @ jnp.asarray(v))
    dense = np.asarray(res.density) @ v
    np.testing.assert_allclose(lazy, dense, rtol=1e-4, atol=1e-7)

    # Barycentric maps have the right shapes:
    assert res.a_to_b.shape == (40, 3)
    assert res.b_to_a.shape == (50, 3)


def test_validation_errors():
    with pytest.raises(ValueError):
        ot.solve(C=[[1.0]], reg=-1.0, max_iter=10)
    with pytest.raises(ValueError):
        ot.solve(C=[[1.0]], reg=0.1, max_iter=None)
    with pytest.raises(NotImplementedError):
        ot.solve(C=[[1.0]], reg=0.1, max_iter=10, unbalanced_type="TV")
    with pytest.raises(ValueError):
        # Infeasible balanced problem:
        ot.solve(C=[[1.0, 2.0]], a=[1.0], b=[3.0, 3.0], reg=0.1, max_iter=10)
    with pytest.raises(ValueError):
        ot.solve(C=[[1.0]], a=[-1.0], b=[1.0], reg=0.1, max_iter=10)
