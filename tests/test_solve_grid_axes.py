"""``ot.solve_grid(axes=..., periodic=...)`` — generalized grid geometry.

The reference documents these parameters but ships only a stub
(``/root/reference/src/geomloss/ot/_implementations/grid.py:224-242``);
these tests pin down the implemented semantics with metamorphic
properties (cost scaling, torus translation invariance) rather than
golden values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomloss_tpu import ot


def _densities(n=48, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.rand(1, n) + 0.1
    b = rng.rand(1, n) + 0.1
    a /= a.sum()
    b /= b.sum()
    return jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)


def test_axes_cost_scaling():
    """Doubling the domain scales the p=2 problem by exactly 4:
    value(axes=[0,2), blur=2s) = 4 * value(axes=[0,1), blur=s)."""
    a, b = _densities()
    v1 = ot.solve_grid(a, b, axes=(0.0, 1.0), blur=0.05, scaling=0.7).value
    v2 = ot.solve_grid(a, b, axes=(0.0, 2.0), blur=0.10, scaling=0.7).value
    np.testing.assert_allclose(np.asarray(v2), 4 * np.asarray(v1), rtol=1e-4)


def test_axes_explicit_coords_match_bounds():
    """A (N,) coordinate array equal to the [vmin, vmax) centers gives the
    same result as the bounds form."""
    a, b = _densities(seed=3)
    n = a.shape[1]
    coords = (0.5 + jnp.arange(n, dtype=jnp.float32)) / n * 3.0 - 1.0
    v1 = ot.solve_grid(a, b, axes=(-1.0, 2.0), blur=0.2, scaling=0.7).value
    v2 = ot.solve_grid(a, b, axes=(coords,), blur=0.2, scaling=0.7).value
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_periodic_translation_invariance():
    """On the torus, rolling both densities by the same whole-pixel shift
    leaves the divergence unchanged."""
    a, b = _densities(seed=5)
    v0 = ot.solve_grid(a, b, periodic=True, blur=0.1, scaling=0.7).value
    k = 17
    va = ot.solve_grid(
        jnp.roll(a, k, axis=1), jnp.roll(b, k, axis=1),
        periodic=True, blur=0.1, scaling=0.7,
    ).value
    np.testing.assert_allclose(np.asarray(v0), np.asarray(va), rtol=1e-5)


def test_periodic_shrinks_distances():
    """Torus distances are <= interval distances, so transporting a peak to
    its far-shifted copy is cheaper with periodic wrap-around."""
    n = 64
    x = (0.5 + np.arange(n)) / n
    a = np.exp(-((x - 0.1) ** 2) / 0.002)
    b = np.roll(a, n // 2)
    a = jnp.asarray(a[None] / a.sum(), jnp.float32)
    b = jnp.asarray(b[None] / b.sum(), jnp.float32)
    v_flat = float(ot.solve_grid(a, b, blur=0.05, axes=(0.0, 1.0), scaling=0.7).value[0])
    v_torus = float(ot.solve_grid(a, b, blur=0.05, periodic=True, scaling=0.7).value[0])
    assert v_torus < v_flat
    assert v_torus > 0


def test_axes_2d_and_marginals():
    rng = np.random.RandomState(9)
    a = rng.rand(2, 16, 24) + 0.1
    b = rng.rand(2, 16, 24) + 0.1
    a = jnp.asarray(a / a.sum((1, 2), keepdims=True), jnp.float32)
    b = jnp.asarray(b / b.sum((1, 2), keepdims=True), jnp.float32)
    res = ot.solve_grid(
        a, b,
        axes=((0.0, 1.0), (0.0, 1.5)),
        periodic=(False, True),
        blur=0.3, scaling=0.7, debias=False,
    )
    # Balanced problem: the plan's row marginals recover `a`:
    np.testing.assert_allclose(
        np.asarray(res.marginal_a), np.asarray(a), atol=2e-3
    )


def test_periodic_with_explicit_coords_raises():
    a, b = _densities()
    coords = jnp.linspace(0.0, 1.0, a.shape[1])
    with pytest.raises(ValueError):
        ot.solve_grid(a, b, axes=(coords,), periodic=True, blur=0.1)


def test_solve_grid_under_jit():
    """Both grid paths (default pyramid and axes/periodic) jit cleanly:
    shapes and schedules are static."""
    a, b = _densities(n=32, seed=11)

    f = jax.jit(
        lambda a, b: ot.solve_grid(
            a, b, axes=(0.0, 2.0), periodic=True, blur=0.1, scaling=0.7
        ).value
    )
    v = f(a, b)
    assert np.isfinite(float(v[0]))
    g = jax.jit(lambda a, b: ot.solve_grid(a, b, blur=0.05, scaling=0.7).value)
    assert np.isfinite(float(g(a, b)[0]))
