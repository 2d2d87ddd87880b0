"""Custom costs through the multiscale (truncated) backend.

Reference capability: ``sinkhorn_multiscale`` accepts a user cost and
runs its truncated loop on it (``_legacy/sinkhorn_samples.py:558,570-573``
— KeOps formula strings there; any traced JAX callable here). The keep
rule evaluates the user cost between cluster centroids exactly like the
reference's ``kernel_truncation`` (``:505-516``), and the fine phase runs
a gather-based truncated LSE (``ops/block_sparse.py::lse_sparse_custom``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geomloss_tpu.models.multiscale import sinkhorn_multiscale
from geomloss_tpu.models.sinkhorn_samples import sinkhorn_tensorized

W_ANISO = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)


def _aniso_cost(xb, yb):
    d = xb[:, :, None, :] - yb[:, None, :, :]
    return (W_ANISO * d**2).sum(-1) / 2


def _sphere(n, s):
    r = np.random.RandomState(s).randn(n, 3)
    r /= np.linalg.norm(r, axis=1, keepdims=True)
    return jnp.asarray(r, jnp.float32)


@pytest.mark.slow
def test_custom_cost_truncated_matches_exact_and_tensorized():
    N = 2048
    x, y = _sphere(N, 0), _sphere(N, 1)
    a = jnp.full((N,), 1.0 / N, jnp.float32)
    kw = dict(p=2, blur=0.05, diameter=2.0, scaling=0.7, cost=_aniso_cost)

    tz = float(sinkhorn_tensorized(a[None], x[None], a[None], y[None], **kw)[0])
    ms5 = float(sinkhorn_multiscale(a, x, a, y, truncate=5, **kw))
    msN = float(sinkhorn_multiscale(a, x, a, y, truncate=None, **kw))

    # Truncation itself is near-exact (the keep margin drops < e^-5 mass):
    assert abs(ms5 - msN) <= 1e-4 * max(abs(msN), 1e-3), (ms5, msN)
    # The two-scale descent tracks the dense solver (coarse warm-start
    # error bounded, same as the Euclidean backend):
    assert abs(ms5 - tz) / abs(tz) < 5e-2, (ms5, tz)


@pytest.mark.slow
def test_custom_cost_multiscale_gradients():
    N = 1024
    x, y = _sphere(N, 2), _sphere(N, 3)
    a = jnp.full((N,), 1.0 / N, jnp.float32)
    kw = dict(p=2, blur=0.05, diameter=2.0, scaling=0.7, cost=_aniso_cost)

    g = jax.grad(
        lambda x: sinkhorn_multiscale(a, x, a, y, truncate=5, **kw)
    )(x)
    gt = jax.grad(
        lambda x: sinkhorn_tensorized(
            a[None], x[None], a[None], y[None], **kw
        )[0]
    )(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # Direction agreement with the dense envelope gradient:
    num = float((g * gt).sum())
    den = float(jnp.linalg.norm(g) * jnp.linalg.norm(gt))
    assert num / den > 0.98, num / den


def test_custom_cost_p1_routes():
    # p=1 with a custom cost exercises the same gather path:
    N = 512
    x, y = _sphere(N, 4), _sphere(N, 5)
    a = jnp.full((N,), 1.0 / N, jnp.float32)

    def l1_cost(xb, yb):
        return jnp.abs(xb[:, :, None, :] - yb[:, None, :, :]).sum(-1)

    v = float(
        sinkhorn_multiscale(
            a, x, a, y, p=1, blur=0.1, diameter=2.0, scaling=0.6,
            truncate=5, cost=l1_cost,
        )
    )
    assert np.isfinite(v)
