"""Truncated block-sparse MMD (kernel_multiscale) vs exact evaluation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss


pytestmark = pytest.mark.slow


def _clouds(N=700, M=750, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(N, 3), jnp.float64)
    y = jnp.asarray(rng.rand(M, 3), jnp.float64)
    a = jnp.full((N,), 1.0 / N)
    b = jnp.full((M,), 1.0 / M)
    return a, x, b, y


@pytest.mark.parametrize("name", ["gaussian", "laplacian"])
def test_kernel_multiscale_matches_online(name):
    a, x, b, y = _clouds()
    kw = dict(loss=name, blur=0.1)
    exact = float(SamplesLoss(backend="online", **kw)(a, x, b, y))
    trunc = float(SamplesLoss(backend="multiscale", **kw)(a, x, b, y))
    # truncate=5 cuts contributions below exp(-12.5) (gaussian) /
    # exp(-5) (laplacian): tolerances accordingly.
    # The truncated and exact paths are two independent f32 summation
    # orders; agreement is ~1e-5 relative, not bitwise.
    tol = 1e-4 if name == "gaussian" else 5e-3
    np.testing.assert_allclose(trunc, exact, rtol=tol, atol=tol * abs(exact))


def test_kernel_multiscale_gradients_match():
    a, x, b, y = _clouds(seed=1)
    kw = dict(loss="gaussian", blur=0.1)
    g_e = jax.grad(lambda x: SamplesLoss(backend="online", **kw)(a, x, b, y))(x)
    g_t = jax.grad(lambda x: SamplesLoss(backend="multiscale", **kw)(a, x, b, y))(x)
    np.testing.assert_allclose(
        np.asarray(g_t), np.asarray(g_e), rtol=1e-3,
        atol=1e-3 * np.abs(np.asarray(g_e)).max()
    )


def test_kernel_multiscale_energy_falls_back_exact():
    a, x, b, y = _clouds(seed=2, N=300, M=320)
    e_on = float(SamplesLoss("energy", backend="online")(a, x, b, y))
    e_ms = float(SamplesLoss("energy", backend="multiscale")(a, x, b, y))
    np.testing.assert_allclose(e_ms, e_on, rtol=1e-10)


def test_kernel_multiscale_potentials():
    a, x, b, y = _clouds(seed=3, N=600, M=600)
    kw = dict(loss="gaussian", blur=0.1, potentials=True)
    F_o, G_o = SamplesLoss(backend="online", **kw)(a, x, b, y)
    F_m, G_m = SamplesLoss(backend="multiscale", **kw)(a, x, b, y)
    # Truncation drops exp(-12.5)-level terms; the potentials cross zero,
    # so compare with an absolute tolerance:
    np.testing.assert_allclose(
        np.asarray(F_m), np.asarray(F_o).squeeze(), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(G_m), np.asarray(G_o).squeeze(), rtol=1e-3, atol=1e-6
    )