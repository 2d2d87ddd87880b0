"""Pallas kernel correctness (interpret mode on CPU, compiled on TPU):
streaming LSE and Gibbs matvec vs the dense XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu.ops.costs import cost_routines
from geomloss_tpu.ops.pallas_kernels import gibbs_apply_pallas, lse_pallas
from geomloss_tpu.ops.softmin import softmin_points


def _problem(N, M, D=3, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(N, D), dtype=jnp.float32)
    y = jnp.asarray(rng.rand(M, D), dtype=jnp.float32)
    h = jnp.asarray(rng.randn(M), dtype=jnp.float32)
    return x, y, h


@pytest.mark.parametrize("p", [1, 2])
@pytest.mark.parametrize("shape", [(64, 96), (200, 300), (256, 1024), (513, 1025)])
def test_lse_pallas_matches_dense(p, shape):
    N, M = shape
    x, y, h = _problem(N, M, seed=N + p)
    eps = jnp.float32(0.21)
    C = cost_routines[p](x, y)
    expected = jax.nn.logsumexp(h[None, :] - C / eps, axis=-1)
    got = lse_pallas(x, y, h, eps, p=p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("p,kind", [(2, "gibbs"), (1, "gibbs"), (1, "gibbs_grad"), (1, "energy")])
def test_gibbs_apply_pallas_matches_dense(p, kind):
    N, M, C_ch = 150, 260, 4
    x, y, h = _problem(N, M, seed=7)
    rng = np.random.RandomState(8)
    phi = jnp.asarray(-np.abs(rng.randn(N)), dtype=jnp.float32)
    V = jnp.asarray(rng.randn(M, C_ch), dtype=jnp.float32)
    eps = jnp.float32(0.5)

    got = gibbs_apply_pallas(x, y, phi, h, V, eps, p=p, kind=kind)

    # Float64 ground truth (the f32 error of a cancelling sum depends on the
    # summation order, so comparing two f32 implementations element-wise
    # requires a scale-aware tolerance):
    xn, yn = np.asarray(x, np.float64), np.asarray(y, np.float64)
    d64 = np.sqrt(((xn[:, None, :] - yn[None, :, :]) ** 2).sum(-1))
    if kind == "energy":
        W = -d64
    else:
        C64 = d64 if p == 1 else d64**2 / 2
        W = np.exp(
            np.asarray(phi, np.float64)[:, None]
            + np.asarray(h, np.float64)[None, :]
            - C64 / float(eps)
        )
        if kind == "gibbs_grad" and p == 1:
            # Weights vanish below the f32 noise floor
            # (ops/softmin.py::GRAD_SQDIST_CUT):
            W = np.where(d64**2 > 1e-6, W / np.maximum(d64, 1e-4), 0.0)
    expected = W @ np.asarray(V, np.float64)
    scale = (np.abs(W) @ np.abs(np.asarray(V, np.float64))).max()
    np.testing.assert_allclose(
        np.asarray(got, np.float64), expected, rtol=2e-3, atol=3e-5 * scale
    )


@pytest.mark.parametrize("p", [1, 2])
def test_softmin_points_pallas_gradients(p):
    # The custom VJP routes through gibbs_apply with impl='pallas':
    x, y, h = _problem(90, 140, seed=11)
    eps = 0.3

    def f_pallas(x, y, h):
        return (softmin_points(eps, (x, y), h, p=p, impl="pallas") ** 2).sum()

    def f_dense(x, y, h):
        return (softmin_points(eps, (x, y), h, p=p, impl="dense") ** 2).sum()

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(x, y, h)
    gd = jax.grad(f_dense, argnums=(0, 1, 2))(x, y, h)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3,
            atol=1e-3 * np.abs(np.asarray(b)).max() + 1e-9,
        )


def test_gibbs_grad_noise_floor_sliver_no_inf():
    """p=1 gibbs_grad weights in the sliver 1e-6 < sq <= 2e-6*(|x|^2+|y|^2)
    (unit-scale coordinates ~1e-3 apart) must not divide by the zeroed
    noise-floor distance (regression: inf weights -> NaN laplacian grads)."""
    rng = np.random.RandomState(0)
    base = rng.randn(256, 3).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    x = jnp.asarray(base)
    y = jnp.asarray(base + 1.2e-3 * rng.randn(256, 3).astype(np.float32))
    phi = jnp.zeros((256,), jnp.float32)
    V = jnp.ones((256, 1), jnp.float32)
    out = gibbs_apply_pallas(x, y, phi, phi, V, jnp.float32(0.3), p=1,
                             kind="gibbs_grad")
    assert bool(jnp.isfinite(out).all())
