"""Equivalence tests for the fused single-pass Sinkhorn step.

The fused step (``ops/softmin.py::sinkhorn_step_points``) computes both
softmin directions of one Jacobi iteration from a single pass over the
"absorbed" Gibbs matrix. It must agree with two independent streaming
LSE sweeps (the reference's per-direction KeOps launches,
``/root/reference/src/geomloss/_legacy/sinkhorn_samples.py:229-290``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geomloss_tpu.models.sinkhorn_samples import sinkhorn_online
from geomloss_tpu.ops.costs import cost_routines
from geomloss_tpu.ops.softmin import sinkhorn_step_points


def _clouds(n, m, d=3, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, d), jnp.float32)
    y = jnp.asarray(rng.randn(m, d) + 0.3, jnp.float32)
    return x, y


@pytest.mark.parametrize("p", [1, 2])
@pytest.mark.parametrize("sym", [False, True])
def test_fused_step_matches_two_sweeps(p, sym):
    N, M = 257, 190
    x, y = _clouds(N, M)
    rng = np.random.RandomState(1)
    f = jnp.asarray(0.2 * rng.randn(N), jnp.float32)
    g = jnp.asarray(0.2 * rng.randn(M), jnp.float32)
    la = jnp.full((N,), -np.log(N), jnp.float32)
    lb = jnp.full((M,), -np.log(M), jnp.float32)

    if sym:
        # sym=True contracts to "same cloud, same potential on both sides"
        # (it may route to the upper-triangle kernel):
        y, g, lb = x, f, la
    S_ref = sinkhorn_step_points(0.1, x, y, la, lb, f, g, p=p, impl="dense", sym=sym)
    # Pallas runs in interpreter mode on CPU:
    S_pl = sinkhorn_step_points(0.1, x, y, la, lb, f, g, p=p, impl="pallas", sym=sym)

    # Float64 ground truth: on p=1 self-problems the dense f32 path's
    # expansion-form diagonal noise (~1e-3) exceeds the kernels' (which
    # zero distances below the f32 noise floor), so compare both against
    # the exact value rather than each other.
    eps = 0.1
    x64, y64 = np.asarray(x, np.float64), np.asarray(y, np.float64)
    d64 = np.sqrt(((x64[:, None, :] - y64[None, :, :]) ** 2).sum(-1))
    C64 = d64 if p == 1 else d64**2 / 2
    h64 = np.asarray(lb, np.float64) + np.asarray(g, np.float64) / eps
    from scipy.special import logsumexp

    S64 = -eps * logsumexp(h64[None, :] - C64 / eps, axis=-1)
    np.testing.assert_allclose(np.asarray(S_pl[0]), S64, atol=2e-4)
    np.testing.assert_allclose(np.asarray(S_ref[0]), S64, atol=2e-3)
    if not sym:
        np.testing.assert_allclose(S_pl[1], S_ref[1], atol=1e-4)
    else:
        assert S_pl[1] is None and S_ref[1] is None


@pytest.mark.parametrize("p", [1, 2])
def test_online_fused_loop_matches_custom_cost_path(p):
    """End-to-end: the fused annealing loop reproduces the (unfused)
    custom-cost streaming path on the same problem."""
    N, M = 300, 260
    x, y = _clouds(N, M, seed=3)
    a = jnp.full((1, N), 1.0 / N, jnp.float32)
    b = jnp.full((1, M), 1.0 / M, jnp.float32)
    kw = dict(p=p, blur=0.3, diameter=4.0, scaling=0.7, debias=True)

    v_fused = sinkhorn_online(a, x[None], b, y[None], **kw)
    # Passing the cost explicitly disables the fused step and routes every
    # softmin through the chunked custom-cost scan:
    v_plain = sinkhorn_online(a, x[None], b, y[None], cost=cost_routines[p], **kw)

    # p=1 carries the f32 noise floor of the expansion-form sqrt (see
    # README "Numerical accuracy on TPU"):
    np.testing.assert_allclose(
        np.asarray(v_fused), np.asarray(v_plain), rtol=5e-4, atol=1e-6
    )


def test_online_fused_loop_batched():
    N, M, B = 150, 180, 3
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    y = jnp.asarray(rng.randn(B, M, 3), jnp.float32)
    a = jnp.full((B, N), 1.0 / N, jnp.float32)
    b = jnp.full((B, M), 1.0 / M, jnp.float32)
    kw = dict(p=2, blur=0.3, diameter=4.0, scaling=0.7, debias=True)

    v = sinkhorn_online(a, x, b, y, **kw)
    v_plain = sinkhorn_online(a, x, b, y, cost=cost_routines[2], **kw)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_plain), rtol=1e-4, atol=1e-6)

    # Batch entries are independent:
    v0 = sinkhorn_online(a[:1], x[:1], b[:1], y[:1], **kw)
    np.testing.assert_allclose(np.asarray(v[0]), np.asarray(v0[0]), rtol=1e-5)


def test_fused_loop_grad_matches_tensorized():
    from geomloss_tpu import SamplesLoss

    N = 220
    x, y = _clouds(N, N, seed=5)
    lt = SamplesLoss("sinkhorn", p=2, blur=0.2, diameter=4.0, backend="tensorized")
    lo = SamplesLoss("sinkhorn", p=2, blur=0.2, diameter=4.0, backend="online")
    gt = jax.grad(lambda x: lt(x, y))(x)
    go = jax.grad(lambda x: lo(x, y))(x)
    np.testing.assert_allclose(np.asarray(go), np.asarray(gt), atol=1e-4)
