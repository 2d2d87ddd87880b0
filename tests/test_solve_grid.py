"""Tests for ot.solve_grid / ot.barycenter_grid (working implementations of
the reference's stubs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from geomloss_tpu import ot


pytestmark = pytest.mark.slow


def _gaussian_image(N, cx, cy, s):
    x = np.arange(N) / N
    g = np.exp(-((x[:, None] - cx) ** 2 + (x[None, :] - cy) ** 2) / (2 * s**2))
    return g / g.sum()


def test_solve_grid_value_matches_sinkhorn_divergence():
    from geomloss_tpu import sinkhorn_divergence

    N = 16
    a = jnp.asarray(_gaussian_image(N, 0.3, 0.3, 0.1))[None]
    b = jnp.asarray(_gaussian_image(N, 0.7, 0.6, 0.12))[None]

    res = ot.solve_grid(a=a, b=b, blur=0.1, debias=True)
    direct = sinkhorn_divergence(a, b, blur=0.1, debias=True)
    np.testing.assert_allclose(np.asarray(res.value), np.asarray(direct), rtol=1e-10)
    assert res.potential_a.shape == a.shape
    assert res.potential_b.shape == b.shape


def test_solve_grid_marginals_close_to_inputs():
    N = 16
    a = jnp.asarray(_gaussian_image(N, 0.4, 0.4, 0.12))[None]
    b = jnp.asarray(_gaussian_image(N, 0.6, 0.5, 0.12))[None]

    res = ot.solve_grid(a=a, b=b, blur=0.05, debias=False, scaling=0.8)
    ma = np.asarray(res.marginal_a)
    mb = np.asarray(res.marginal_b)
    # Marginal constraints are enforced up to Sinkhorn convergence:
    np.testing.assert_allclose(ma.sum(), 1.0, rtol=2e-2)
    np.testing.assert_allclose(mb.sum(), 1.0, rtol=2e-2)
    np.testing.assert_allclose(ma, np.asarray(a), atol=2e-3)
    np.testing.assert_allclose(mb, np.asarray(b), atol=2e-3)


def test_solve_grid_density_operator_signed_inputs():
    N = 8
    rng = np.random.RandomState(0)
    a = rng.rand(N, N)
    a /= a.sum()
    b = rng.rand(N, N)
    b /= b.sum()
    res = ot.solve_grid(a=jnp.asarray(a)[None], b=jnp.asarray(b)[None], blur=0.2)

    v = jnp.asarray(rng.randn(1, N, N))
    out = res.density_operator @ v
    assert out.shape == (1, N, N)
    assert np.all(np.isfinite(np.asarray(out)))
    # Linearity of the operator:
    out2 = res.density_operator @ (2.0 * v)
    np.testing.assert_allclose(np.asarray(out2), 2 * np.asarray(out), rtol=1e-6)


def test_solve_grid_1d_and_3d():
    x = np.arange(32) / 32
    a1 = np.exp(-((x - 0.3) ** 2) / 0.005)
    b1 = np.exp(-((x - 0.7) ** 2) / 0.005)
    a1, b1 = a1 / a1.sum(), b1 / b1.sum()
    res1 = ot.solve_grid(a=jnp.asarray(a1)[None], b=jnp.asarray(b1)[None], blur=0.05)
    # W2^2 / 2 between two ~diracs 0.4 apart is ~ 0.4^2/2 = 0.08:
    assert 0.05 < float(res1.value[0]) < 0.1

    rng = np.random.RandomState(1)
    a3 = rng.rand(8, 8, 8)
    a3 /= a3.sum()
    b3 = rng.rand(8, 8, 8)
    b3 /= b3.sum()
    res3 = ot.solve_grid(a=jnp.asarray(a3)[None], b=jnp.asarray(b3)[None], blur=0.2)
    assert np.isfinite(float(res3.value[0]))


def test_barycenter_grid():
    N = 16
    a = _gaussian_image(N, 0.3, 0.5, 0.1)
    b = _gaussian_image(N, 0.7, 0.5, 0.1)
    measures = jnp.asarray(np.stack([a, b])[None])
    bar = ot.barycenter_grid(a=measures)
    assert bar.shape == (1, N, N)
    bar_np = np.asarray(bar[0])
    np.testing.assert_allclose(bar_np.sum(), 1.0, rtol=2e-2)
    com_x = (np.arange(N) / N * bar_np.sum(1)).sum() / bar_np.sum()
    assert 0.4 < com_x < 0.6


def test_barycenter_grid_1d_and_3d():
    # 1D: barycenter of two shifted bumps is a central bump.
    N = 32
    x = np.arange(N) / N
    a1 = np.exp(-((x - 0.3) ** 2) / 0.004)
    b1 = np.exp(-((x - 0.7) ** 2) / 0.004)
    a1, b1 = a1 / a1.sum(), b1 / b1.sum()
    m1 = jnp.asarray(np.stack([a1, b1])[None])  # (1, 2, N)
    bar1 = ot.barycenter_grid(a=m1)
    assert bar1.shape == (1, N)
    com = float((jnp.arange(N) / N * bar1[0]).sum() / bar1[0].sum())
    assert 0.4 < com < 0.6

    # 3D: runs, conserves mass.
    rng = np.random.RandomState(0)
    vols = rng.rand(1, 2, 8, 8, 8)
    vols /= vols.sum(axis=(2, 3, 4), keepdims=True)
    bar3 = ot.barycenter_grid(a=jnp.asarray(vols), scaling_N=20)
    assert bar3.shape == (1, 8, 8, 8)
    np.testing.assert_allclose(float(bar3.sum()), 1.0, rtol=0.1)
