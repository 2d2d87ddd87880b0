"""Warm-starting the online Sinkhorn solver (extension over the reference)."""

import numpy as np

import jax
import jax.numpy as jnp

from geomloss_tpu.models.sinkhorn_samples import sinkhorn_online
import pytest


pytestmark = pytest.mark.slow


def _clouds(N=120, M=130, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(1, N, 3))
    y = jnp.asarray(rng.rand(1, M, 3))
    a = jnp.full((1, N), 1.0 / N)
    b = jnp.full((1, M), 1.0 / M)
    return a, x, b, y


def test_warm_start_matches_cold_solution():
    a, x, b, y = _clouds()
    kw = dict(p=2, blur=0.1, diameter=1.9, scaling=0.9)

    raw = sinkhorn_online(a, x, b, y, potentials="raw", **kw)
    cold = sinkhorn_online(a, x, b, y, **kw)

    # Warm start from the converged potentials on the SAME problem:
    warm = sinkhorn_online(
        a, x, b, y, init_potentials=raw, warm_start_iters=2, **kw
    )
    np.testing.assert_allclose(float(warm[0]), float(cold[0]), rtol=1e-2)


def test_warm_start_tracks_moving_cloud():
    # A gradient-flow-style loop: after a small displacement, two warm
    # iterations reach the same value as a full cold solve.
    a, x, b, y = _clouds(seed=1)
    kw = dict(p=2, blur=0.1, diameter=1.9, scaling=0.9)
    raw = sinkhorn_online(a, x, b, y, potentials="raw", **kw)

    x2 = x + 0.005
    cold2 = float(sinkhorn_online(a, x2, b, y, **kw)[0])
    warm2 = float(
        sinkhorn_online(a, x2, b, y, init_potentials=raw, warm_start_iters=3, **kw)[0]
    )
    np.testing.assert_allclose(warm2, cold2, rtol=1e-3, atol=1e-7)

    # Gradients flow through the warm-started solve as well:
    g = jax.grad(
        lambda x: sinkhorn_online(
            a, x, b, y, init_potentials=raw, warm_start_iters=3, **kw
        )[0]
    )(x2)
    assert np.all(np.isfinite(np.asarray(g)))
