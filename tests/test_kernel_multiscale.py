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

def test_kernel_multiscale_custom_kernel_truncated():
    """User kernel= callables run through the block-sparse kept-tile
    ranges (reference capability, _legacy/kernel_samples.py:206-271), not
    the dense fallback: a custom gaussian matches both the named
    truncated path and the exact streaming value."""
    a, x, b, y = _clouds(seed=4)

    def my_gauss(x, y, blur=0.05):
        sq = ((x[..., :, None, :] - y[..., None, :, :]) ** 2).sum(-1)
        return jnp.exp(-sq / (2 * blur**2))

    kw = dict(loss="gaussian", blur=0.1)
    exact = float(SamplesLoss(backend="online", **kw)(a, x, b, y))
    named = float(SamplesLoss(backend="multiscale", **kw)(a, x, b, y))
    custom = float(
        SamplesLoss(backend="multiscale", kernel=my_gauss, **kw)(a, x, b, y)
    )
    np.testing.assert_allclose(custom, exact, rtol=1e-4, atol=1e-4 * abs(exact))
    # Same kept-tile ranges as the named path — agreement is tighter:
    np.testing.assert_allclose(custom, named, rtol=1e-5, atol=1e-5 * abs(exact))


def test_kernel_multiscale_custom_kernel_actually_truncates():
    """The custom-kernel path visits only the kept tile pairs (it is not
    a silent dense fallback): a compactly-supported custom kernel with a
    small kernel_radius gives the same value as its dense evaluation, and
    the sparse matvec helper is what computes it."""
    import geomloss_tpu.models.kernel_samples as ks

    a, x, b, y = _clouds(seed=5, N=600, M=640)

    def bump(x, y, blur=0.05):
        sq = ((x[..., :, None, :] - y[..., None, :, :]) ** 2).sum(-1)
        return jnp.maximum(1.0 - sq / blur**2, 0.0)  # support radius = blur

    calls = {"n": 0}
    real = ks._kernel_matvec_sparse_custom

    def spy(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    ks._kernel_matvec_sparse_custom = spy
    try:
        trunc = float(
            ks.kernel_multiscale(
                a, x, b, y, blur=0.25, kernel=bump, kernel_radius=0.25
            )
        )
    finally:
        ks._kernel_matvec_sparse_custom = real
    assert calls["n"] == 3  # xx, yy, xy all through the sparse path
    dense = float(
        ks.kernel_tensorized(
            a[None], x[None], b[None], y[None], blur=0.25, kernel=bump
        )[0]
    )
    np.testing.assert_allclose(trunc, dense, rtol=1e-6, atol=1e-10)


def test_kernel_multiscale_custom_kernel_gradients():
    a, x, b, y = _clouds(seed=6, N=600, M=600)

    def my_gauss(x, y, blur=0.05):
        sq = ((x[..., :, None, :] - y[..., None, :, :]) ** 2).sum(-1)
        return jnp.exp(-sq / (2 * blur**2))

    kw = dict(loss="gaussian", blur=0.1)
    g_e = jax.grad(
        lambda x: SamplesLoss(backend="online", **kw)(a, x, b, y)
    )(x)
    g_c = jax.grad(
        lambda x: SamplesLoss(backend="multiscale", kernel=my_gauss, **kw)(
            a, x, b, y
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_c), np.asarray(g_e), rtol=1e-3,
        atol=1e-3 * np.abs(np.asarray(g_e)).max(),
    )
