"""``ot.barycenter`` (fixed support, explicit costs) and
``ot.barycenter_sample`` (free support) — working implementations of the
reference's non-functional stubs
(``/root/reference/src/geomloss/ot/_implementations/matrix.py:709-717``,
``sample.py:644-652``), tested against closed-form and metamorphic
properties.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomloss_tpu import ot


def _grid_cost(n=5):
    x = jnp.linspace(0.0, 1.0, n)
    return (x[:, None] - x[None, :]) ** 2


# ======================================================================
# Fixed support (ot.barycenter)
# ======================================================================


def test_barycenter_diracs_midpoint():
    """The W2 barycenter of delta_0 and delta_1 is delta_{1/2}."""
    C = _grid_cost(5)
    res = ot.barycenter(
        jnp.stack([C, C]),
        a=jnp.stack([jnp.eye(5)[0], jnp.eye(5)[4]]),
        reg=1e-3,
        max_iter=60,
        cost_bar=C,
    )
    assert int(jnp.argmax(res.masses)) == 2
    np.testing.assert_allclose(float(res.masses.sum()), 1.0, atol=1e-3)


def test_barycenter_single_measure_identity():
    """K=1: the debiased barycenter reproduces the measure itself."""
    C = _grid_cost(7)
    rng = np.random.RandomState(0)
    a = rng.rand(7) + 0.1
    a = jnp.asarray(a / a.sum(), jnp.float32)
    res = ot.barycenter(C[None], a=a[None], reg=1e-3, max_iter=80, cost_bar=C)
    np.testing.assert_allclose(np.asarray(res.masses), np.asarray(a), atol=5e-3)


def test_barycenter_degenerate_weights():
    """weights = (1, 0) recovers the first measure."""
    C = _grid_cost(7)
    rng = np.random.RandomState(1)
    a1 = rng.rand(7) + 0.1
    a1 = jnp.asarray(a1 / a1.sum(), jnp.float32)
    a2 = jnp.full((7,), 1.0 / 7, jnp.float32)
    res = ot.barycenter(
        jnp.stack([C, C]),
        a=jnp.stack([a1, a2]),
        weights=jnp.array([1.0, 0.0]),
        reg=1e-3,
        max_iter=80,
        cost_bar=C,
    )
    np.testing.assert_allclose(np.asarray(res.masses), np.asarray(a1), atol=5e-3)


def test_barycenter_permutation_symmetry():
    """Swapping the measures (and weights) leaves the barycenter unchanged."""
    C = _grid_cost(6)
    rng = np.random.RandomState(2)
    a1 = rng.rand(6) + 0.1
    a2 = rng.rand(6) + 0.1
    a1, a2 = a1 / a1.sum(), a2 / a2.sum()
    a12 = jnp.asarray(np.stack([a1, a2]), jnp.float32)
    w = jnp.array([0.3, 0.7])
    r1 = ot.barycenter(jnp.stack([C, C]), a=a12, weights=w, reg=1e-2, max_iter=50)
    r2 = ot.barycenter(
        jnp.stack([C, C]), a=a12[::-1], weights=w[::-1], reg=1e-2, max_iter=50
    )
    np.testing.assert_allclose(
        np.asarray(r1.masses), np.asarray(r2.masses), rtol=1e-5, atol=1e-8
    )


def test_barycenter_batched_shapes():
    C = _grid_cost(5)
    cost = jnp.broadcast_to(C, (3, 2, 5, 5))
    res = ot.barycenter(cost, reg=1e-2, max_iter=30)
    assert res.masses.shape == (3, 5)
    assert res.samples is None
    # Unbatched (K, N, M) form squeezes the batch axis:
    res1 = ot.barycenter(cost[0], reg=1e-2, max_iter=30)
    assert res1.masses.shape == (5,)
    np.testing.assert_allclose(
        np.asarray(res1.masses), np.asarray(res.masses[0]), rtol=1e-6
    )


def test_barycenter_differentiable():
    """Gradients flow to the input masses through the envelope tail."""
    C = _grid_cost(5)

    def f(a1):
        a = jnp.stack([a1 / a1.sum(), jnp.full((5,), 0.2)])
        res = ot.barycenter(jnp.stack([C, C]), a=a, reg=1e-2, max_iter=30)
        return jnp.sum(res.masses**2)

    g = jax.grad(f)(jnp.asarray([0.1, 0.2, 0.4, 0.2, 0.1]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_barycenter_validation():
    C = _grid_cost(4)
    with pytest.raises(ValueError):
        ot.barycenter(C, reg=1e-2, max_iter=None)
    with pytest.raises(NotImplementedError):
        ot.barycenter(C, reg=0.0, max_iter=10)
    with pytest.raises(ValueError):
        ot.barycenter(jnp.zeros((2, 3, 4, 5, 6)), reg=1e-2, max_iter=10)
    with pytest.raises(ValueError):
        ot.barycenter(C[None], reg=1e-2, max_iter=10, cost_bar=jnp.zeros((3, 3)))


# ======================================================================
# Free support (ot.barycenter_sample)
# ======================================================================


def test_barycenter_sample_shifted_gaussians():
    """Barycenter of two shifted copies of a cloud: midpoint position,
    preserved spread (debiasing avoids entropic shrinkage)."""
    rng = np.random.RandomState(0)
    base = rng.randn(256, 2).astype(np.float32)
    x1 = jnp.asarray(base + np.array([2.0, 0.0], np.float32))
    x2 = jnp.asarray(rng.randn(256, 2).astype(np.float32) - np.array([2.0, 0.0], np.float32))
    res = ot.barycenter_sample(jnp.stack([x1, x2]), blur=0.05, n_iter=6)
    z = np.asarray(res.samples)
    assert res.masses.shape == (256,)
    np.testing.assert_allclose(z.mean(0), [0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(z.std(0), [1.0, 1.0], atol=0.1)


def test_barycenter_sample_degenerate_weights():
    rng = np.random.RandomState(1)
    x1 = jnp.asarray(rng.randn(64, 3).astype(np.float32))
    x2 = jnp.asarray(rng.randn(64, 3).astype(np.float32) + 1.0)
    res = ot.barycenter_sample(
        jnp.stack([x1, x2]), weights=jnp.array([1.0, 0.0]), blur=0.05, n_iter=3
    )
    np.testing.assert_allclose(np.asarray(res.samples), np.asarray(x1), atol=1e-4)


def test_barycenter_sample_translation_equivariance():
    rng = np.random.RandomState(2)
    clouds = jnp.asarray(rng.randn(2, 64, 2).astype(np.float32))
    v = jnp.asarray([5.0, -3.0], jnp.float32)
    r0 = ot.barycenter_sample(clouds, blur=0.05, n_iter=4, diameter=20.0)
    r1 = ot.barycenter_sample(clouds + v, blur=0.05, n_iter=4, diameter=20.0)
    np.testing.assert_allclose(
        np.asarray(r1.samples), np.asarray(r0.samples + v), atol=2e-2
    )


def test_barycenter_sample_single_and_batched_forms():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(32, 2).astype(np.float32))
    # (N, D): the barycenter of one measure is (approximately) itself.
    res = ot.barycenter_sample(x, blur=0.05, n_iter=2)
    assert res.samples.shape == (32, 2)
    np.testing.assert_allclose(np.asarray(res.samples), np.asarray(x), atol=5e-2)
    # (B, K, N, D) keeps the batch axis:
    xb = jnp.asarray(rng.randn(2, 3, 16, 2).astype(np.float32))
    resb = ot.barycenter_sample(xb, blur=0.1, n_iter=2)
    assert resb.samples.shape == (2, 16, 2)
    assert resb.masses.shape == (2, 16)


def test_barycenter_jit_with_static_maxmin():
    """Under jax.jit the annealing length must be static: pass
    ``maxmin_cost=`` (same convention as SamplesLoss's ``diameter=``)."""
    C = _grid_cost(5)

    @jax.jit
    def solve(a):
        return ot.barycenter(
            jnp.stack([C, C]), a=a, reg=1e-3, max_iter=40,
            cost_bar=C, maxmin_cost=1.0,
        ).masses

    m = solve(jnp.stack([jnp.eye(5)[0], jnp.eye(5)[4]]))
    assert int(jnp.argmax(m)) == 2
    g = jax.grad(lambda a: jnp.sum(solve(a) ** 2))(
        jnp.stack([jnp.eye(5)[0] + 0.1, jnp.eye(5)[4] + 0.1])
    )
    assert bool(jnp.isfinite(g).all())


def test_barycenter_broadcast_forms():
    """(N,) masses and (K,) weights broadcast against batched costs, as
    the docstring promises."""
    C = _grid_cost(5)
    cost = jnp.broadcast_to(C, (2, 2, 5, 5))
    a = jnp.asarray([0.1, 0.2, 0.4, 0.2, 0.1])
    res = ot.barycenter(cost, a=a, weights=jnp.array([0.5, 0.5]),
                        reg=1e-2, max_iter=20)
    assert res.masses.shape == (2, 5)
    # Unnormalized masses are normalized internally:
    res2 = ot.barycenter(cost, a=100.0 * a, weights=jnp.array([2.0, 2.0]),
                         reg=1e-2, max_iter=20)
    np.testing.assert_allclose(
        np.asarray(res2.masses), np.asarray(res.masses), rtol=1e-6
    )


def test_barycenter_backward_iterations_zero():
    """backward_iterations=0 differentiates through the whole descent
    (reference ImagesBarycenter semantics)."""
    C = _grid_cost(5)

    def f(a1):
        a = jnp.stack([a1 / a1.sum(), jnp.full((5,), 0.2)])
        res = ot.barycenter(
            jnp.stack([C, C]), a=a, reg=1e-2, max_iter=20,
            backward_iterations=0,
        )
        return jnp.sum(res.masses ** 2)

    v = f(jnp.asarray([0.1, 0.2, 0.4, 0.2, 0.1]))
    g = jax.grad(f)(jnp.asarray([0.1, 0.2, 0.4, 0.2, 0.1]))
    assert np.isfinite(float(v))
    # Non-debiased barycenters are gauge-fixed onto the simplex:
    res = ot.barycenter(jnp.stack([C, C]), reg=1e-2, max_iter=20,
                        backward_iterations=0)
    np.testing.assert_allclose(float(res.masses.sum()), 1.0, rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_barycenter_sample_batched_init_broadcast():
    rng = np.random.RandomState(7)
    xb = jnp.asarray(rng.randn(2, 2, 16, 2).astype(np.float32))
    init = jnp.asarray(rng.randn(16, 2).astype(np.float32))
    res = ot.barycenter_sample(xb, blur=0.1, n_iter=1, init=init)
    assert res.samples.shape == (2, 16, 2)


def test_barycenter_sample_single_trace():
    """The fixed-point descent is ONE traced program per call: no per-
    iteration / per-measure retracing (round-2 review item — the naive
    version traced ``n_iter * B`` fresh ``jax.grad`` programs)."""
    from geomloss_tpu.ot.sample_impl import barycenter_sample

    rng = np.random.RandomState(4)
    clouds = jnp.asarray(rng.randn(3, 32, 2).astype(np.float32))
    before = barycenter_sample._trace_count
    res = ot.barycenter_sample(clouds, blur=0.1, n_iter=5, diameter=10.0)
    assert res.samples.shape == (32, 2)
    assert barycenter_sample._trace_count == before + 1
