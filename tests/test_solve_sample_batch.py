"""ot.solve_sample_batch (implemented here; unimplemented upstream)."""

import numpy as np

import jax.numpy as jnp

from geomloss_tpu import ot
import pytest


pytestmark = pytest.mark.slow


def test_solve_sample_batch_matches_single_solves():
    rng = np.random.RandomState(0)
    B, N, M, D = 3, 20, 25, 2
    X_a = rng.rand(B, N, D)
    X_b = rng.rand(B, M, D)

    results = ot.solve_sample_batch(
        X_a=X_a.tolist(), X_b=X_b.tolist(), reg=0.02, max_iter=200
    )
    assert len(results) == B
    for k in range(B):
        single = ot.solve_sample(
            X_a=X_a[k].tolist(), X_b=X_b[k].tolist(), reg=0.02, max_iter=200
        )
        # Shared (global-diameter) schedule vs per-problem schedule:
        np.testing.assert_allclose(
            float(results[k].value), float(single.value), rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(results[k].plan), np.asarray(single.plan), atol=2e-3
        )


def test_solve_sample_batch_debias_and_marginals():
    rng = np.random.RandomState(1)
    B, N, M, D = 2, 30, 30, 3
    X_a = rng.rand(B, N, D)
    X_b = rng.rand(B, M, D)
    results = ot.solve_sample_batch(
        X_a=X_a.tolist(), X_b=X_b.tolist(), blur=0.05, debias=True, max_iter=300
    )
    for res in results:
        assert np.isfinite(float(res.value))
        np.testing.assert_allclose(
            np.asarray(res.marginal_a), np.full(N, 1 / N), atol=5e-3
        )
