"""Multiscale potentials mode: de-sorting back to user point order."""

import numpy as np

import jax.numpy as jnp

from geomloss_tpu import SamplesLoss
import pytest


pytestmark = pytest.mark.slow


def test_multiscale_potentials_match_tensorized():
    rng = np.random.RandomState(0)
    N, M = 500, 520
    x = jnp.asarray(rng.rand(N, 3))
    y = jnp.asarray(rng.rand(M, 3))
    a = jnp.full((N,), 1.0 / N)
    b = jnp.full((M,), 1.0 / M)

    kw = dict(loss="sinkhorn", p=2, blur=0.1, scaling=0.8, potentials=True)
    F_d, G_d = SamplesLoss(backend="tensorized", **kw)(a, x, b, y)
    F_m, G_m = SamplesLoss(backend="multiscale", **kw)(a, x, b, y)

    F_d, G_d = np.asarray(F_d).squeeze(), np.asarray(G_d).squeeze()
    F_m, G_m = np.asarray(F_m), np.asarray(G_m)
    assert F_m.shape == (N,) and G_m.shape == (M,)
    # Potentials agree up to multiscale solver tolerance — and crucially,
    # they must be in the *user's* point order (a permutation bug would
    # produce O(1) discrepancies):
    assert np.abs(F_m - F_d).max() < 5e-3
    assert np.abs(G_m - G_d).max() < 5e-3
