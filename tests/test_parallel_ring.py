"""Multi-chip ring-softmin tests on an 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss
from geomloss_tpu.parallel.ring import points_mesh, sinkhorn_ring


pytestmark = pytest.mark.slow


def _clouds(N, M, D=3, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(N, D))
    y = jnp.asarray(rng.rand(M, D))
    a = jnp.full((N,), 1.0 / N)
    b = jnp.full((M,), 1.0 / M)
    return a, x, b, y


def test_sinkhorn_ring_matches_single_device():
    a, x, b, y = _clouds(64, 96, seed=0)
    mesh = points_mesh(8)
    ring_val = sinkhorn_ring(a, x, b, y, mesh=mesh, blur=0.1, diameter=2.0)
    ref_val = SamplesLoss("sinkhorn", blur=0.1, diameter=2.0, backend="online")(
        a, x, b, y
    )
    np.testing.assert_allclose(float(ring_val), float(ref_val), rtol=1e-10)


def test_sinkhorn_ring_gradients_match():
    a, x, b, y = _clouds(64, 64, seed=1)
    mesh = points_mesh(8)

    g_ring = jax.grad(
        lambda x: sinkhorn_ring(a, x, b, y, mesh=mesh, blur=0.1, diameter=2.0)
    )(x)
    g_ref = jax.grad(
        lambda x: SamplesLoss("sinkhorn", blur=0.1, diameter=2.0, backend="online")(
            a, x, b, y
        )
    )(x)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref), rtol=1e-8, atol=1e-12)


def test_sinkhorn_ring_jits_with_training_step():
    a, x, b, y = _clouds(64, 64, seed=2)
    mesh = points_mesh(8)

    @jax.jit
    def train_step(x):
        loss, g = jax.value_and_grad(
            lambda x: sinkhorn_ring(a, x, b, y, mesh=mesh, blur=0.1, diameter=2.0)
        )(x)
        return loss, x - 0.5 * g

    l0, x1 = train_step(x)
    l1, _ = train_step(x1)
    assert float(l1) < float(l0)


def test_sinkhorn_ring_uneven_sizes():
    """N, M not divisible by the mesh size: padded internally."""
    a, x, b, y = _clouds(61, 99, seed=3)
    mesh = points_mesh(8)
    ring_val = sinkhorn_ring(a, x, b, y, mesh=mesh, blur=0.1, diameter=2.0)
    ref_val = SamplesLoss("sinkhorn", blur=0.1, diameter=2.0, backend="online")(
        a, x, b, y
    )
    np.testing.assert_allclose(float(ring_val), float(ref_val), rtol=1e-8)


def test_sinkhorn_ring_potentials_global():
    """potentials=True returns full-length global arrays (padding sliced)."""
    from geomloss_tpu.parallel.ring import sinkhorn_ring

    a, x, b, y = _clouds(61, 99, seed=4)
    mesh = points_mesh(8)
    F, G = sinkhorn_ring(
        a, x, b, y, mesh=mesh, blur=0.1, diameter=2.0, potentials=True
    )
    F_ref, G_ref = SamplesLoss(
        "sinkhorn", blur=0.1, diameter=2.0, backend="online", potentials=True
    )(a, x, b, y)
    assert F.shape == (61,) and G.shape == (99,)
    np.testing.assert_allclose(
        np.asarray(F), np.asarray(F_ref).reshape(-1), rtol=1e-7, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(G), np.asarray(G_ref).reshape(-1), rtol=1e-7, atol=1e-10
    )


@pytest.mark.parametrize("name", ["gaussian", "laplacian", "energy"])
def test_kernel_ring_matches_single_device(name):
    from geomloss_tpu.parallel.ring import kernel_ring

    a, x, b, y = _clouds(61, 80, seed=5)
    mesh = points_mesh(8)
    ring_val = kernel_ring(a, x, b, y, name=name, blur=0.2, mesh=mesh)
    ref_val = SamplesLoss(name, blur=0.2, backend="online")(a, x, b, y)
    np.testing.assert_allclose(float(ring_val), float(ref_val), rtol=1e-8, atol=1e-12)


def test_kernel_ring_gradients_match():
    from geomloss_tpu.parallel.ring import kernel_ring

    a, x, b, y = _clouds(64, 64, seed=6)
    mesh = points_mesh(8)
    g_ring = jax.grad(
        lambda x: kernel_ring(a, x, b, y, name="gaussian", blur=0.2, mesh=mesh)
    )(x)
    g_ref = jax.grad(
        lambda x: SamplesLoss("gaussian", blur=0.2, backend="online")(a, x, b, y)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_ring), np.asarray(g_ref), rtol=1e-7, atol=1e-12
    )


def test_batch_sharded_samples_loss():
    """Data parallelism: shard the batch axis of the tensorized backend
    across the mesh with jit + explicit shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.RandomState(7)
    B, N, M = 8, 32, 40
    x = jnp.asarray(rng.rand(B, N, 3))
    y = jnp.asarray(rng.rand(B, M, 3))
    a = jnp.full((B, N), 1.0 / N)
    b = jnp.full((B, M), 1.0 / M)

    loss = SamplesLoss("sinkhorn", blur=0.1, diameter=2.0, backend="tensorized")
    mesh = points_mesh(8, axis="batch")
    shard3 = NamedSharding(mesh, P("batch", None, None))
    shard2 = NamedSharding(mesh, P("batch", None))

    ref = loss(a, x, b, y)  # replicated single-device reference

    xs = jax.device_put(x, shard3)
    ys = jax.device_put(y, shard3)
    as_ = jax.device_put(a, shard2)
    bs = jax.device_put(b, shard2)
    sharded_vals = jax.jit(lambda a, x, b, y: loss(a, x, b, y))(as_, xs, bs, ys)

    np.testing.assert_allclose(
        np.asarray(sharded_vals), np.asarray(ref), rtol=1e-12
    )


def test_sinkhorn_ring_unbalanced_matches_single_device():
    """reach= threads through dampening, the damped updates, and the
    unbalanced cost's psum'd mass terms (incl. zero-weight padding)."""
    rng = np.random.RandomState(11)
    # Uneven sizes force padding; unnormalized masses exercise the
    # unbalanced mass constants:
    x = jnp.asarray(rng.rand(101, 3), jnp.float32)
    y = jnp.asarray(rng.rand(115, 3), jnp.float32)
    a = jnp.asarray(rng.rand(101) + 0.2, jnp.float32)
    b = jnp.asarray(rng.rand(115) + 0.5, jnp.float32)
    kw = dict(p=2, blur=0.1, reach=0.4, diameter=1.9, scaling=0.7)

    from geomloss_tpu.models.sinkhorn_samples import sinkhorn_online

    v1 = sinkhorn_online(a[None], x[None], b[None], y[None], **kw)[0]
    v8 = sinkhorn_ring(a, x, b, y, mesh=points_mesh(8), **kw)
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-5)


def test_sinkhorn_ring_no_debias_matches_single_device():
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.rand(96, 2), jnp.float32)
    y = jnp.asarray(rng.rand(96, 2), jnp.float32)
    a = jnp.full((96,), 1.0 / 96, jnp.float32)
    b = jnp.full((96,), 1.0 / 96, jnp.float32)
    kw = dict(p=2, blur=0.05, diameter=1.5, scaling=0.7, debias=False)

    from geomloss_tpu.models.sinkhorn_samples import sinkhorn_online

    v1 = sinkhorn_online(a[None], x[None], b[None], y[None], **kw)[0]
    v8 = sinkhorn_ring(a, x, b, y, mesh=points_mesh(8), **kw)
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-5)
