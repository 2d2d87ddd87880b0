"""Brenier convex-gradient oracle: deformations that are gradients of
convex functions have a known diagonal optimal plan and exact OT value —
the strongest *gradient-semantics* oracle in the reference
(``tests/generators/convex_gradients.py:34-131``), re-derived here with
our own construction (see ``oracle_utils.brenier_pair``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss, ot
from oracle_utils import assert_potentials_modulo_constant, brenier_pair


CASES = [(3, 12, 1), (4, 15, 2), (5, 12, 3)]


@pytest.mark.parametrize("seed,N,D", CASES)
def test_brenier_ot_solve_matrix(seed, N, D):
    x, y, w, value = brenier_pair(seed, N, D, strength=1.0)
    C = 0.5 * ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)

    res = ot.solve(C, a=w, b=w, reg=5e-4, max_iter=2000)

    # The linear cost <plan, C> matches the sharp Brenier value; the full
    # (regularized) value carries an O(eps * entropy) bias, checked at the
    # reference's loose tolerance (convex_gradients.py: atol=rtol=1e-2):
    np.testing.assert_allclose(
        float(res.value_linear), value, rtol=1e-2, atol=1e-3
    )
    np.testing.assert_allclose(float(res.value), value, rtol=1e-2, atol=1e-2)
    plan = np.asarray(res.plan)
    # Flat atol like the reference (the entropic plan spreads ~eps
    # mass to neighboring points at reg=1e-3):
    np.testing.assert_allclose(plan, np.diag(w), atol=1e-2)
    np.testing.assert_allclose(plan.sum(-1), w, atol=1e-4)
    np.testing.assert_allclose(plan.sum(-2), w, atol=1e-4)


@pytest.mark.parametrize("seed,N,D", CASES)
def test_brenier_ot_solve_sample(seed, N, D):
    # solve_sample uses the POT convention C = |x - y|^2 (not halved):
    x, y, w, value = brenier_pair(seed, N, D, strength=1.0)
    res = ot.solve_sample(X_a=x, X_b=y, a=w, b=w, reg=1e-3, max_iter=2000)
    np.testing.assert_allclose(
        float(res.value_linear), 2 * value, rtol=1e-2, atol=2e-3
    )
    np.testing.assert_allclose(float(res.value), 2 * value, rtol=1e-2, atol=2e-2)
    plan = np.asarray(res.plan)
    # Flat atol like the reference (the entropic plan spreads ~eps
    # mass to neighboring points at reg=1e-3):
    np.testing.assert_allclose(plan, np.diag(w), atol=1e-2)


def test_brenier_potentials_symmetry():
    """The dual pair of OT(alpha -> beta) equals the swapped pair of
    OT(beta -> alpha), modulo the additive gauge."""
    x, y, w, _ = brenier_pair(7, 16, 2)
    C = 0.5 * ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    ab = ot.solve(C, a=w, b=w, reg=1e-2, max_iter=500)
    ba = ot.solve(C.T, a=w, b=w, reg=1e-2, max_iter=500)
    assert_potentials_modulo_constant(
        ab.potential_a, ab.potential_b, ba.potential_b, ba.potential_a,
        atol=1e-4,
    )


@pytest.mark.parametrize("seed,N,D", [(11, 64, 2), (12, 96, 3)])
def test_brenier_samples_loss_gradient(seed, N, D):
    """At the sharp-OT limit, the gradient of the (debiased) Sinkhorn
    divergence w.r.t. x_i is exactly a_i * (x_i - T(x_i)) = a_i (x_i - y_i)
    for the p=2 cost — the envelope-theorem oracle."""
    x, y, w, value = brenier_pair(seed, N, D, strength=0.5)
    xj, yj, wj = jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)

    loss = SamplesLoss(
        "sinkhorn", p=2, blur=0.005, scaling=0.9, diameter=2.0, debias=True
    )
    val, grad = jax.value_and_grad(lambda x: loss(wj, x, wj, yj))(xj)

    expected_grad = w[:, None] * (x - y)
    scale = np.abs(expected_grad).max()
    np.testing.assert_allclose(float(val), value, rtol=0.05, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grad), expected_grad, atol=0.05 * scale
    )
