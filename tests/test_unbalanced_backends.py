"""Unbalanced OT consistency across backends (values and gradients)."""

import numpy as np

import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss
import pytest


pytestmark = pytest.mark.slow


def _clouds(N=80, M=90, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(N, 3))
    y = jnp.asarray(rng.rand(M, 3))
    a = jnp.asarray(rng.rand(N) + 0.2)  # different total masses
    b = jnp.asarray(rng.rand(M) + 0.5)
    return a, x, b, y


def test_unbalanced_online_matches_tensorized():
    a, x, b, y = _clouds()
    kw = dict(loss="sinkhorn", p=2, blur=0.1, reach=0.4, diameter=1.9)
    v_t = SamplesLoss(backend="tensorized", **kw)(a, x, b, y)
    v_o = SamplesLoss(backend="online", **kw)(a, x, b, y)
    np.testing.assert_allclose(float(v_o), float(v_t), rtol=1e-9)

    g_t = jax.grad(lambda x: SamplesLoss(backend="tensorized", **kw)(a, x, b, y))(x)
    g_o = jax.grad(lambda x: SamplesLoss(backend="online", **kw)(a, x, b, y))(x)
    np.testing.assert_allclose(np.asarray(g_o), np.asarray(g_t), rtol=1e-7, atol=1e-12)


def test_unbalanced_multiscale_close_to_tensorized():
    a, x, b, y = _clouds(N=400, M=420, seed=1)
    kw = dict(loss="sinkhorn", p=2, blur=0.05, reach=0.4, diameter=1.9, scaling=0.8)
    v_t = SamplesLoss(backend="tensorized", **kw)(a, x, b, y)
    v_m = SamplesLoss(backend="multiscale", **kw)(a, x, b, y)
    np.testing.assert_allclose(float(v_m), float(v_t), rtol=5e-2)
