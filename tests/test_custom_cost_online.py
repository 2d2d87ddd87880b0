"""Custom cost callables on the streaming (online) backend — an extension
over the reference, whose online backend only accepts KeOps formula
strings (``_legacy/sinkhorn_samples.py:316-334``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss


def aniso_cost(x, y):
    """Anisotropic halved squared distance: stretch the first axis."""
    w = jnp.asarray([2.0, 1.0, 0.5], x.dtype)
    d = (x[..., :, None, :] - y[..., None, :, :]) * w
    return 0.5 * (d**2).sum(-1)


def _clouds(N=220, M=260, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(N, 3), jnp.float32)
    y = jnp.asarray(rng.rand(M, 3), jnp.float32)
    a = jnp.full((N,), 1.0 / N, jnp.float32)
    b = jnp.full((M,), 1.0 / M, jnp.float32)
    return a, x, b, y


def test_online_custom_cost_matches_tensorized():
    a, x, b, y = _clouds()
    kw = dict(loss="sinkhorn", blur=0.05, diameter=2.0, cost=aniso_cost)
    on = SamplesLoss(backend="online", **kw)
    tz = SamplesLoss(backend="tensorized", **kw)
    v_on, v_tz = float(on(a, x, b, y)), float(tz(a, x, b, y))
    np.testing.assert_allclose(v_on, v_tz, rtol=1e-5)


def test_online_custom_cost_gradients_match_tensorized():
    a, x, b, y = _clouds(seed=1)
    kw = dict(loss="sinkhorn", blur=0.05, diameter=2.0, cost=aniso_cost)
    g_on = jax.grad(lambda x: SamplesLoss(backend="online", **kw)(a, x, b, y))(x)
    g_tz = jax.grad(lambda x: SamplesLoss(backend="tensorized", **kw)(a, x, b, y))(x)
    scale = float(jnp.max(jnp.abs(g_tz)))
    np.testing.assert_allclose(
        np.asarray(g_on), np.asarray(g_tz), atol=1e-4 * scale
    )


def test_online_custom_cost_jits_and_chunks():
    # M chosen so the scan pads the last chunk:
    a, x, b, y = _clouds(N=150, M=333, seed=2)
    kw = dict(loss="sinkhorn", blur=0.1, diameter=2.0, cost=aniso_cost)
    on = SamplesLoss(backend="online", **kw)
    v = jax.jit(lambda a, x, b, y: on(a, x, b, y))(a, x, b, y)
    assert np.isfinite(float(v))
