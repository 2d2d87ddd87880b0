"""Multi-chip ring-softmin tests on an 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss
from geomloss_tpu.parallel.ring import points_mesh, sinkhorn_ring


def _clouds(N, M, D=3, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(N, D))
    y = jnp.asarray(rng.rand(M, D))
    a = jnp.full((N,), 1.0 / N)
    b = jnp.full((M,), 1.0 / M)
    return a, x, b, y


def test_sinkhorn_ring_matches_single_device():
    a, x, b, y = _clouds(64, 96, seed=0)
    mesh = points_mesh(8)
    ring_val = sinkhorn_ring(a, x, b, y, mesh=mesh, blur=0.1, diameter=2.0)
    ref_val = SamplesLoss("sinkhorn", blur=0.1, diameter=2.0, backend="online")(
        a, x, b, y
    )
    np.testing.assert_allclose(float(ring_val), float(ref_val), rtol=1e-10)


def test_sinkhorn_ring_gradients_match():
    a, x, b, y = _clouds(64, 64, seed=1)
    mesh = points_mesh(8)

    g_ring = jax.grad(
        lambda x: sinkhorn_ring(a, x, b, y, mesh=mesh, blur=0.1, diameter=2.0)
    )(x)
    g_ref = jax.grad(
        lambda x: SamplesLoss("sinkhorn", blur=0.1, diameter=2.0, backend="online")(
            a, x, b, y
        )
    )(x)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref), rtol=1e-8, atol=1e-12)


def test_sinkhorn_ring_jits_with_training_step():
    a, x, b, y = _clouds(64, 64, seed=2)
    mesh = points_mesh(8)

    @jax.jit
    def train_step(x):
        loss, g = jax.value_and_grad(
            lambda x: sinkhorn_ring(a, x, b, y, mesh=mesh, blur=0.1, diameter=2.0)
        )(x)
        return loss, x - 0.5 * g

    l0, x1 = train_step(x)
    l1, _ = train_step(x1)
    assert float(l1) < float(l0)
