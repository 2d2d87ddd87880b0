"""End-to-end jit/grad compatibility of the public front-ends (with an
explicit diameter, every backend must compile and differentiate)."""

import numpy as np

import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss


def _clouds(N=300, M=320, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(N, 3), jnp.float32)
    y = jnp.asarray(rng.rand(M, 3), jnp.float32)
    a = jnp.full((N,), 1.0 / N, jnp.float32)
    b = jnp.full((M,), 1.0 / M, jnp.float32)
    return a, x, b, y


def test_all_backends_jit_value_and_grad():
    a, x, b, y = _clouds()
    vals = {}
    for backend in ["tensorized", "online", "multiscale"]:
        loss = SamplesLoss(
            "sinkhorn", p=2, blur=0.05, diameter=1.9, scaling=0.7, backend=backend
        )
        step = jax.jit(jax.value_and_grad(lambda x: loss(a, x, b, y)))
        v, g = step(x)
        assert np.isfinite(float(v))
        assert np.all(np.isfinite(np.asarray(g)))
        vals[backend] = float(v)
    np.testing.assert_allclose(vals["online"], vals["tensorized"], rtol=1e-5)
    np.testing.assert_allclose(vals["multiscale"], vals["tensorized"], rtol=0.15, atol=1e-4)


def test_mmd_backends_jit_value_and_grad():
    a, x, b, y = _clouds(seed=1)
    for name in ["gaussian", "laplacian", "energy"]:
        for backend in ["online", "multiscale"]:
            loss = SamplesLoss(name, blur=0.1, backend=backend)
            step = jax.jit(jax.value_and_grad(lambda x: loss(a, x, b, y)))
            v, g = step(x)
            assert np.isfinite(float(v)), (name, backend)
            assert np.all(np.isfinite(np.asarray(g))), (name, backend)
