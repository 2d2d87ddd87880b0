"""Golden parity tests: run the *actual reference library* (torch CPU,
tensorized backend) side by side with geomloss_tpu and compare values and
gradients. This pins down every numerical convention: epsilon schedules,
symmetric updates, debiasing, envelope-theorem gradients, unbalanced
weights, potentials mode, and the MMD kernel losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from geomloss import SamplesLoss as RefSamplesLoss  # noqa: E402

from geomloss_tpu import SamplesLoss  # noqa: E402


pytestmark = pytest.mark.golden


def _clouds(N=40, M=55, D=3, seed=0, batch=0):
    rng = np.random.RandomState(seed)
    shape_x = (batch, N, D) if batch else (N, D)
    shape_y = (batch, M, D) if batch else (M, D)
    x = rng.rand(*shape_x)
    y = rng.rand(*shape_y)
    a = rng.rand(*shape_x[:-1]) + 0.1
    b = rng.rand(*shape_y[:-1]) + 0.1
    a = a / a.sum(-1, keepdims=True)
    b = b / b.sum(-1, keepdims=True)
    return a, x, b, y


def _run_ref(kwargs, a, x, b, y, grads=False):
    xt = torch.tensor(x, requires_grad=grads, dtype=torch.float64)
    yt = torch.tensor(y, dtype=torch.float64)
    at = torch.tensor(a, requires_grad=grads, dtype=torch.float64)
    bt = torch.tensor(b, dtype=torch.float64)
    loss = RefSamplesLoss(**kwargs)
    val = loss(at, xt, bt, yt)
    if grads:
        val.sum().backward()
        return (
            val.detach().numpy(),
            xt.grad.detach().numpy(),
            at.grad.detach().numpy(),
        )
    if isinstance(val, tuple):
        return tuple(v.detach().numpy() for v in val)
    return val.detach().numpy()


def _run_ours(kwargs, a, x, b, y, grads=False):
    xj, yj, aj, bj = map(jnp.asarray, (x, y, a, b))
    loss = SamplesLoss(**kwargs)
    if grads:

        def f(xj, aj):
            return jnp.sum(jnp.atleast_1d(loss(aj, xj, bj, yj)))

        val = loss(aj, xj, bj, yj)
        gx, ga = jax.grad(f, argnums=(0, 1))(xj, aj)
        return np.asarray(val), np.asarray(gx), np.asarray(ga)
    val = loss(aj, xj, bj, yj)
    if isinstance(val, tuple):
        return tuple(np.asarray(v) for v in val)
    return np.asarray(val)


SINKHORN_CASES = [
    dict(loss="sinkhorn", p=2, blur=0.05, backend="tensorized"),
    dict(loss="sinkhorn", p=2, blur=0.5, backend="tensorized"),
    dict(loss="sinkhorn", p=1, blur=0.1, backend="tensorized"),
    dict(loss="sinkhorn", p=2, blur=0.05, scaling=0.9, backend="tensorized"),
    dict(loss="sinkhorn", p=2, blur=0.05, debias=False, backend="tensorized"),
    dict(loss="sinkhorn", p=2, blur=0.05, reach=0.3, backend="tensorized"),
    dict(
        loss="sinkhorn", p=2, blur=0.05, reach=0.3, debias=False, backend="tensorized"
    ),
]


@pytest.mark.parametrize("kwargs", SINKHORN_CASES)
def test_sinkhorn_values_match_reference(kwargs):
    a, x, b, y = _clouds(seed=1)
    ref = _run_ref(kwargs, a, x, b, y)
    ours = _run_ours(kwargs, a, x, b, y)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("kwargs", SINKHORN_CASES)
def test_sinkhorn_gradients_match_reference(kwargs):
    a, x, b, y = _clouds(seed=2)
    # Under jax.grad the inputs are traced, so the diameter must be given
    # explicitly; pass the same value to the reference to keep schedules equal.
    kwargs = dict(kwargs, diameter=1.9)
    ref_v, ref_gx, ref_ga = _run_ref(kwargs, a, x, b, y, grads=True)
    our_v, our_gx, our_ga = _run_ours(kwargs, a, x, b, y, grads=True)
    np.testing.assert_allclose(our_v, ref_v, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(our_gx, ref_gx, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(our_ga, ref_ga, rtol=1e-8, atol=1e-10)


def test_sinkhorn_batched_matches_reference():
    a, x, b, y = _clouds(seed=3, batch=3, N=25, M=30)
    kwargs = dict(loss="sinkhorn", p=2, blur=0.05, backend="tensorized")
    ref = _run_ref(kwargs, a, x, b, y)
    ours = _run_ours(kwargs, a, x, b, y)
    assert ours.shape == (3,)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_sinkhorn_potentials_match_reference():
    a, x, b, y = _clouds(seed=4)
    kwargs = dict(loss="sinkhorn", p=2, blur=0.05, backend="tensorized", potentials=True)
    ref_F, ref_G = _run_ref(kwargs, a, x, b, y)
    our_F, our_G = _run_ours(kwargs, a, x, b, y)
    np.testing.assert_allclose(our_F.squeeze(), ref_F.squeeze(), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(our_G.squeeze(), ref_G.squeeze(), rtol=1e-9, atol=1e-12)


KERNEL_CASES = [
    dict(loss="energy", backend="tensorized"),
    dict(loss="gaussian", blur=0.3, backend="tensorized"),
    dict(loss="laplacian", blur=0.3, backend="tensorized"),
]


def test_hausdorff_with_explicit_kernel_matches_reference():
    # In this snapshot of the reference, "hausdorff" is aliased to the
    # kernel routines *without* a default kernel name
    # (``_legacy/samples_loss.py:12-14``), so an explicit kernel callable
    # is required. We reproduce that contract.
    a, x, b, y = _clouds(seed=11)

    def torch_kernel(x, y, blur=None, **kw):
        return (-((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1) / (2 * 0.09)).exp()

    def jax_kernel(x, y, blur=None, **kw):
        return jnp.exp(-((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1) / (2 * 0.09))

    ref = _run_ref(
        dict(loss="hausdorff", backend="tensorized", kernel=torch_kernel), a, x, b, y
    )
    ours = _run_ours(
        dict(loss="hausdorff", backend="tensorized", kernel=jax_kernel), a, x, b, y
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("kwargs", KERNEL_CASES)
def test_kernel_losses_match_reference(kwargs):
    a, x, b, y = _clouds(seed=5)
    ref = _run_ref(kwargs, a, x, b, y)
    ours = _run_ours(kwargs, a, x, b, y)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("kwargs", KERNEL_CASES)
def test_kernel_gradients_match_reference(kwargs):
    a, x, b, y = _clouds(seed=6)
    ref_v, ref_gx, ref_ga = _run_ref(kwargs, a, x, b, y, grads=True)
    our_v, our_gx, our_ga = _run_ours(kwargs, a, x, b, y, grads=True)
    np.testing.assert_allclose(our_v, ref_v, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(our_gx, ref_gx, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(our_ga, ref_ga, rtol=1e-8, atol=1e-10)


def test_online_backend_matches_tensorized():
    a, x, b, y = _clouds(seed=7)
    kw = dict(loss="sinkhorn", p=2, blur=0.05)
    dense = _run_ours(dict(backend="tensorized", **kw), a, x, b, y)
    online = _run_ours(dict(backend="online", **kw), a, x, b, y)
    np.testing.assert_allclose(online, dense, rtol=1e-9, atol=1e-12)


def test_online_gradients_match_tensorized():
    a, x, b, y = _clouds(seed=8)
    kw = dict(loss="sinkhorn", p=2, blur=0.05, diameter=1.9)
    _, gx_d, ga_d = _run_ours(dict(backend="tensorized", **kw), a, x, b, y, grads=True)
    _, gx_o, ga_o = _run_ours(dict(backend="online", **kw), a, x, b, y, grads=True)
    np.testing.assert_allclose(gx_o, gx_d, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(ga_o, ga_d, rtol=1e-8, atol=1e-10)


def test_multiscale_backend_close_to_tensorized():
    # Multiscale is an approximation of the same divergence: coarse-to-fine
    # with extrapolation. Values should agree to solver tolerance.
    a, x, b, y = _clouds(seed=9, N=300, M=310)
    kw = dict(loss="sinkhorn", p=2, blur=0.05)
    dense = _run_ours(dict(backend="tensorized", **kw), a, x, b, y)
    multi = _run_ours(dict(backend="multiscale", **kw), a, x, b, y)
    np.testing.assert_allclose(multi, dense, rtol=0.1, atol=5e-4)


def test_multiscale_truncation_consistency():
    # The block-sparse truncated fine phase must agree with the exact
    # (truncate=None) fine phase to high accuracy, and both must be close
    # to the tensorized reference value.
    from geomloss_tpu.models.multiscale import sinkhorn_multiscale

    a, x, b, y = _clouds(seed=12, N=600, M=640)
    aj, xj, bj, yj = map(jnp.asarray, (a, x, b, y))
    kw = dict(p=2, blur=0.05, diameter=1.9, scaling=0.7)
    exact = float(sinkhorn_multiscale(aj, xj, bj, yj, truncate=None, **kw))
    trunc = float(sinkhorn_multiscale(aj, xj, bj, yj, truncate=5, **kw))
    np.testing.assert_allclose(trunc, exact, rtol=1e-3, atol=1e-7)

    dense = _run_ours(
        dict(backend="tensorized", loss="sinkhorn", **kw), a, x, b, y
    )
    np.testing.assert_allclose(exact, float(dense), rtol=0.1, atol=5e-4)


def test_multiscale_truncated_gradients_match_exact():
    from geomloss_tpu.models.multiscale import sinkhorn_multiscale

    a, x, b, y = _clouds(seed=13, N=500, M=500)
    aj, xj, bj, yj = map(jnp.asarray, (a, x, b, y))
    kw = dict(p=2, blur=0.05, diameter=1.9, scaling=0.7)
    g_exact = jax.grad(
        lambda x: sinkhorn_multiscale(aj, x, bj, yj, truncate=None, **kw)
    )(xj)
    g_trunc = jax.grad(
        lambda x: sinkhorn_multiscale(aj, x, bj, yj, truncate=5, **kw)
    )(xj)
    np.testing.assert_allclose(
        np.asarray(g_trunc), np.asarray(g_exact), rtol=1e-2, atol=1e-6
    )


def test_two_and_four_arg_forms():
    _, x, _, y = _clouds(seed=10)
    loss = SamplesLoss("sinkhorn", p=2, blur=0.1)
    v2 = loss(jnp.asarray(x), jnp.asarray(y))
    N, M = x.shape[0], y.shape[0]
    v4 = loss(
        jnp.full((N,), 1.0 / N),
        jnp.asarray(x),
        jnp.full((M,), 1.0 / M),
        jnp.asarray(y),
    )
    np.testing.assert_allclose(float(v2), float(v4), rtol=1e-12)


def test_multiscale_p1_truncation_consistency():
    from geomloss_tpu.models.multiscale import sinkhorn_multiscale

    a, x, b, y = _clouds(seed=14, N=700, M=750)
    aj, xj, bj, yj = map(jnp.asarray, (a, x, b, y))
    kw = dict(p=1, blur=0.05, diameter=1.9, scaling=0.7)
    exact = float(sinkhorn_multiscale(aj, xj, bj, yj, truncate=None, **kw))
    trunc = float(sinkhorn_multiscale(aj, xj, bj, yj, truncate=5, **kw))
    # p=1 truncation cuts exp(-truncate) ~ 7e-3 tails; both paths also sit
    # ~2e-4 from the f64 tensorized value (the two-scale scheme's own
    # approximation), so demand agreement at the truncation budget only:
    np.testing.assert_allclose(trunc, exact, rtol=5e-3, atol=1e-8)
