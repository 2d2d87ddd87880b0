"""float32 / float64 test matrix.

The reference's hypothesis generators sweep ``{float32, float64}``
(``/root/reference/tests/generators/common.py:28-38``); our conftest
forces x64 globally, so every other module exercises f64 by default.
This module re-runs the strongest oracles with *explicitly cast* inputs
in both dtypes, with dtype-appropriate tolerances — catching the
f32-specific class of bug (noise floors, subnormal flushes, silent
upcasts) on CPU, off-hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss, ot
from oracle_utils import brenier_pair

DTYPES = [jnp.float32, jnp.float64]

# f32 carries ~1e-7 relative noise per op and the solvers run hundreds of
# LSE reductions; 1e-4 absolute on O(1) values is the observed envelope.
VAL_ATOL = {jnp.float32: 1e-4, jnp.float64: 1e-9}


def _ids(dt):
    return dt.__name__


# --- dtype preservation ------------------------------------------------------


@pytest.mark.parametrize("dt", DTYPES, ids=_ids)
@pytest.mark.parametrize("backend", ["tensorized", "online", "multiscale"])
def test_samples_loss_preserves_dtype(dt, backend):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 3)), dtype=dt)
    y = jnp.asarray(rng.normal(size=(70, 3)), dtype=dt)
    loss = SamplesLoss(
        "sinkhorn", p=2, blur=0.1, diameter=8.0, backend=backend
    )
    L = loss(x, y)
    assert L.dtype == dt
    g = jax.grad(lambda x: loss(x, y))(x)
    assert g.dtype == dt
    assert bool(jnp.isfinite(L)) and bool(jnp.isfinite(g).all())


@pytest.mark.parametrize("dt", DTYPES, ids=_ids)
def test_ot_solve_preserves_dtype(dt):
    rng = np.random.default_rng(5)
    C = jnp.asarray(rng.random((12, 15)), dtype=dt)
    res = ot.solve(C, reg=0.05, max_iter=200)
    assert res.value.dtype == dt
    assert res.plan.dtype == dt
    assert res.potential_a.dtype == dt
    assert res.marginal_a.dtype == dt


# --- f32 vs f64 agreement on the same problem -------------------------------


@pytest.mark.parametrize("loss_kind", ["sinkhorn", "gaussian", "energy"])
def test_f32_matches_f64(loss_kind):
    rng = np.random.default_rng(11)
    x64 = jnp.asarray(rng.normal(size=(80, 3)), dtype=jnp.float64)
    y64 = jnp.asarray(rng.normal(size=(75, 3)), dtype=jnp.float64)
    loss = SamplesLoss(loss_kind, p=2, blur=0.1, diameter=8.0)
    L64 = float(loss(x64, y64))
    L32 = float(loss(x64.astype(jnp.float32), y64.astype(jnp.float32)))
    assert abs(L32 - L64) < 1e-4 * max(1.0, abs(L64))


# --- oracles in both dtypes --------------------------------------------------


@pytest.mark.parametrize("dt", DTYPES, ids=_ids)
def test_brenier_oracle_dtype(dt):
    x, y, w, value = brenier_pair(4, 14, 2, strength=1.0)
    x = jnp.asarray(x, dtype=dt)
    y = jnp.asarray(y, dtype=dt)
    w = jnp.asarray(w, dtype=dt)
    res = ot.solve_sample(X_a=x, X_b=y, a=w, b=w, reg=1e-3, max_iter=2000)
    assert res.value.dtype == dt
    np.testing.assert_allclose(
        float(res.value_linear), 2 * value, rtol=1e-2, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(res.plan), np.diag(w), atol=1e-2)


@pytest.mark.parametrize("dt", DTYPES, ids=_ids)
def test_janati_gaussian_oracle_dtype(dt):
    # Closed-form entropic OT between grid Gaussians (Janati et al. 2020);
    # same construction as tests/test_gaussians_oracle.py, explicit dtype.
    ma, sa, mb, sb, blur = 0.2, 0.15, 0.8, 0.2, 0.3
    N, M = 54, 57
    gx = np.linspace(-1, 2, N)
    gy = np.linspace(-1, 2, M)
    a = np.exp(-0.5 * (gx - ma) ** 2 / sa**2)
    a /= a.sum()
    b = np.exp(-0.5 * (gy - mb) ** 2 / sb**2)
    b /= b.sum()
    C = (gx[:, None] - gy[None, :]) ** 2

    res = ot.solve(
        C=jnp.asarray(C, dtype=dt),
        a=jnp.asarray(a, dtype=dt),
        b=jnp.asarray(b, dtype=dt),
        reg=2 * blur**2,
        max_iter=1000,
    )
    s2 = blur**2
    A, B = sa**2, sb**2
    D_s = np.sqrt(4 * A * B + blur**4)
    bures = A + B - D_s + s2 * (1 - np.log(2 * s2)) + s2 * np.log(D_s + s2)
    expected = (ma - mb) ** 2 + bures
    np.testing.assert_allclose(float(res.value), expected, atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(res.marginal_a), a, atol=1e-2)


# --- f32-specific failure modes ----------------------------------------------


def test_f32_p1_self_loss_is_zero():
    """p=1 distances go through the dot-expansion; without the noise-floor
    zeroing (ops/costs.py) the self-problem diagonal picks up ~1e-3 of
    phantom distance — S(x, x) must still be ~0 in f32."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(100, 3)) * 10, dtype=jnp.float32)
    L = SamplesLoss("sinkhorn", p=1, blur=0.05, diameter=80.0)(x, x)
    assert abs(float(L)) < 1e-4


def test_f32_tiny_epsilon_division():
    """f32 flushes 1e-40 to zero: near-empty clusters / tiny weights must
    not produce NaNs (>= 1e-30 epsilon policy in divisions)."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(50, 2)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(50, 2)), dtype=jnp.float32)
    a = np.full(50, 1e-38, dtype=np.float32)
    a[0] = 1.0
    a /= a.sum()
    b = np.ones(50, dtype=np.float32) / 50
    L = SamplesLoss("sinkhorn", p=2, blur=0.1, diameter=8.0)(
        jnp.asarray(a), x, jnp.asarray(b), y
    )
    assert bool(jnp.isfinite(L))
