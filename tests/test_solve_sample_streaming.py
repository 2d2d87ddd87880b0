"""ot.solve_sample: the streaming (never-materialized) solver path must
match the dense path exactly."""

import numpy as np

import jax.numpy as jnp

import geomloss_tpu.ot.sample_impl as ss
from geomloss_tpu import ot
import pytest


pytestmark = pytest.mark.slow


def test_streaming_solver_matches_dense(monkeypatch):
    rng = np.random.RandomState(0)
    N, M = 60, 70
    x = rng.rand(N, 2)
    y = rng.rand(M, 2)

    res_dense = ot.solve_sample(
        X_a=x.tolist(), X_b=y.tolist(), reg=0.02, max_iter=200, debias=True
    )
    v_dense = float(res_dense.value)
    f_dense = np.asarray(res_dense.potential_a)

    # Force the streaming branch (normally kicks in above 5000^2 entries):
    monkeypatch.setattr(ss, "STREAMING_THRESHOLD", 0)
    res_stream = ot.solve_sample(
        X_a=x.tolist(), X_b=y.tolist(), reg=0.02, max_iter=200, debias=True
    )
    v_stream = float(res_stream.value)
    f_stream = np.asarray(res_stream.potential_a)

    np.testing.assert_allclose(v_stream, v_dense, rtol=1e-10)
    np.testing.assert_allclose(f_stream, f_dense, rtol=1e-8, atol=1e-12)

    # Streaming operators agree with the dense plan:
    v = rng.rand(M)
    lazy = np.asarray(res_stream.lazy_plan @ jnp.asarray(v))
    dense = np.asarray(res_dense.plan) @ v
    np.testing.assert_allclose(lazy, dense, rtol=1e-6, atol=1e-12)

    m_a = np.asarray(res_stream.marginal_a)
    np.testing.assert_allclose(m_a, np.asarray(res_dense.marginal_a), rtol=1e-6)
