"""Hypothesis property tests for ot.solve, mirroring the reference's
metamorphic test strategy (tests/test_ot_solve_matrix.py upstream)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from geomloss_tpu import ot
import pytest


pytestmark = pytest.mark.slow


@st.composite
def ot_problems(draw):
    N = draw(st.integers(min_value=2, max_value=12))
    M = draw(st.integers(min_value=2, max_value=12))
    seed = draw(st.integers(min_value=0, max_value=2**16))
    rng = np.random.RandomState(seed)
    C = rng.rand(N, M)
    a = rng.rand(N) + 0.1
    b = rng.rand(M) + 0.1
    b = b * a.sum() / b.sum()
    return C, a, b


@settings(max_examples=15, deadline=None, derandomize=True)
@given(ot_problems())
def test_symmetry_property(problem):
    C, a, b = problem
    res_ab = ot.solve(C=C.tolist(), a=a.tolist(), b=b.tolist(), reg=0.05, max_iter=100)
    res_ba = ot.solve(
        C=C.T.tolist(), a=b.tolist(), b=a.tolist(), reg=0.05, max_iter=100
    )
    np.testing.assert_allclose(float(res_ab.value), float(res_ba.value), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(res_ab.plan), np.asarray(res_ba.plan).T, rtol=1e-5, atol=1e-9
    )


@settings(max_examples=15, deadline=None, derandomize=True)
@given(ot_problems(), st.floats(min_value=0.2, max_value=4.0))
def test_cost_linearity_property(problem, scale):
    C, a, b = problem
    res = ot.solve(C=C.tolist(), a=a.tolist(), b=b.tolist(), reg=0.05, max_iter=100)
    res_s = ot.solve(
        C=(scale * C).tolist(), a=a.tolist(), b=b.tolist(),
        reg=scale * 0.05, max_iter=100,
    )
    np.testing.assert_allclose(
        float(res_s.value), scale * float(res.value), rtol=1e-8
    )


@settings(max_examples=15, deadline=None, derandomize=True)
@given(ot_problems())
def test_marginals_property(problem):
    C, a, b = problem
    res = ot.solve(C=C.tolist(), a=a.tolist(), b=b.tolist(), reg=0.01, max_iter=400)
    plan = np.asarray(res.plan)
    # Reference comparator tolerance (tests/check_ot_result.py: atol=1e-2):
    np.testing.assert_allclose(plan.sum(1), a, rtol=3e-2, atol=1e-2)
    np.testing.assert_allclose(plan.sum(0), b, rtol=3e-2, atol=1e-2)
    assert (plan >= 0).all()
