"""Unit tests for the softmin/LSE primitives: dense vs scan vs pallas,
plus analytic-VJP correctness against JAX autodiff of the dense path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu.ops.costs import cost_routines
from geomloss_tpu.ops.softmin import (
    gibbs_apply,
    lse_points,
    softmin_dense,
    softmin_points,
)


def _random_problem(N=37, M=53, D=3, seed=0, dtype=np.float64):
    rng = np.random.RandomState(seed)
    x = rng.randn(N, D).astype(dtype)
    y = rng.randn(M, D).astype(dtype)
    h = rng.randn(M).astype(dtype)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(h)


@pytest.mark.parametrize("p", [1, 2])
@pytest.mark.parametrize("impl", ["dense", "scan"])
def test_lse_points_matches_dense_reference(p, impl):
    x, y, h = _random_problem()
    eps = jnp.asarray(0.3)
    C = cost_routines[p](x, y)
    expected = jax.nn.logsumexp(h[None, :] - C / eps, axis=-1)
    got = lse_points(x, y, h, eps, p, impl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-10)


@pytest.mark.parametrize("p", [1, 2])
def test_softmin_points_equals_softmin_dense(p):
    x, y, h = _random_problem(seed=1)
    eps = 0.17
    C = cost_routines[p](x, y)
    expected = softmin_dense(eps, C, h)
    got = softmin_points(eps, (x, y), h, p=p, impl="scan")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-10)


@pytest.mark.parametrize("p", [1, 2])
@pytest.mark.parametrize("impl", ["dense", "scan"])
def test_custom_vjp_matches_autodiff(p, impl):
    x, y, h = _random_problem(N=17, M=23, seed=2)
    eps = jnp.asarray(0.25)

    def f_custom(x, y, h):
        return (lse_points(x, y, h, eps, p, impl) * jnp.arange(1.0, 18.0)).sum()

    def f_auto(x, y, h):
        C = cost_routines[p](x, y)
        lse = jax.nn.logsumexp(h[None, :] - C / eps, axis=-1)
        return (lse * jnp.arange(1.0, 18.0)).sum()

    g_custom = jax.grad(f_custom, argnums=(0, 1, 2))(x, y, h)
    g_auto = jax.grad(f_auto, argnums=(0, 1, 2))(x, y, h)
    for gc, ga in zip(g_custom, g_auto):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ga), rtol=1e-8, atol=1e-12)


def test_batched_softmin_points():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 11, 2))
    y = jnp.asarray(rng.randn(4, 13, 2))
    h = jnp.asarray(rng.randn(4, 13))
    eps = 0.4
    got = softmin_points(eps, (x, y), h, p=2, impl="scan")
    assert got.shape == (4, 11)
    for i in range(4):
        exp_i = softmin_dense(eps, cost_routines[2](x[i], y[i]), h[i])
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(exp_i), rtol=1e-10)


@pytest.mark.parametrize("kind", ["gibbs", "energy"])
@pytest.mark.parametrize("impl", ["dense", "scan"])
def test_gibbs_apply(kind, impl):
    x, y, h = _random_problem(N=19, M=29, seed=4)
    V = jnp.asarray(np.random.RandomState(5).randn(29, 4))
    phi = jnp.zeros(19)
    eps = jnp.asarray(0.5)
    p = 2 if kind == "gibbs" else 1
    got = gibbs_apply(x, y, phi, h, V, eps, p, kind=kind, impl=impl)
    if kind == "gibbs":
        C = cost_routines[2](x, y)
        W = jnp.exp(phi[:, None] + h[None, :] - C / eps)
    else:
        W = -cost_routines[1](x, y)
    expected = W @ V
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-9)


def test_jit_with_traced_eps():
    x, y, h = _random_problem(seed=6)

    @jax.jit
    def run(eps):
        return softmin_points(eps, (x, y), h, p=2, impl="scan")

    a = run(jnp.asarray(0.3))
    b = softmin_points(0.3, (x, y), h, p=2, impl="dense")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)
