"""Row-sharded multiscale fine phase (multi-chip scale-out of the
truncated backend — ``parallel/multiscale_sharded.py``): values,
gradients and potentials against the single-device backend, on the
8-virtual-CPU-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu.models.multiscale import sinkhorn_multiscale
from geomloss_tpu.parallel import points_mesh, sinkhorn_multiscale_sharded

pytestmark = pytest.mark.slow


def _clouds(N, M, D=2, seed=0, uniform=True):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(N, D), jnp.float32)
    y = jnp.asarray(rng.rand(M, D), jnp.float32)
    if uniform:
        a = jnp.full((N,), 1.0 / N, jnp.float32)
        b = jnp.full((M,), 1.0 / M, jnp.float32)
    else:
        a = jnp.asarray(rng.rand(N) + 0.2, jnp.float32)
        a = a / a.sum()
        b = jnp.asarray(rng.rand(M) + 0.2, jnp.float32)
        b = b / b.sum()
    return a, x, b, y


KW = dict(p=2, blur=0.02, diameter=1.5, scaling=0.7, target_clusters=256)


def test_sharded_matches_single_device():
    # Sizes sit in (2048, 4096] so the single-device (tile * 2^k) and the
    # 8-device (tile * 8 * 2^k) paddings coincide at 4096: with equal
    # padded sizes the Hilbert sort, blocks and truncation tables agree
    # exactly and the tolerance tests pure sharding arithmetic. (With
    # different paddings the sort-key resolution differs and truncation
    # keeps slightly different tile sets — a ~1e-3 effect, not a bug.)
    a, x, b, y = _clouds(3072, 3584)
    v1 = sinkhorn_multiscale(a, x, b, y, **KW)
    v8 = sinkhorn_multiscale_sharded(a, x, b, y, mesh=points_mesh(8), **KW)
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-4)


def test_sharded_uneven_sizes_and_weights():
    # N, M neither multiples of the mesh size nor powers of two:
    a, x, b, y = _clouds(2055, 1947, seed=3, uniform=False)
    v1 = sinkhorn_multiscale(a, x, b, y, **KW)
    v8 = sinkhorn_multiscale_sharded(a, x, b, y, mesh=points_mesh(4), **KW)
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-4)


def test_sharded_gradients_match():
    a, x, b, y = _clouds(2000, 2000, seed=1)
    mesh = points_mesh(4)

    g1 = jax.grad(lambda x: sinkhorn_multiscale(a, x, b, y, **KW))(x)
    g8 = jax.grad(
        lambda x: sinkhorn_multiscale_sharded(a, x, b, y, mesh=mesh, **KW)
    )(x)
    scale = np.abs(np.asarray(g1)).max()
    np.testing.assert_allclose(
        np.asarray(g8), np.asarray(g1), atol=5e-4 * scale
    )


def test_sharded_potentials_global():
    a, x, b, y = _clouds(2000, 2304, seed=2, uniform=False)
    F1, G1 = sinkhorn_multiscale(a, x, b, y, potentials=True, **KW)
    F8, G8 = sinkhorn_multiscale_sharded(
        a, x, b, y, mesh=points_mesh(4), potentials=True, **KW
    )
    assert F8.shape == (2000,) and G8.shape == (2304,)
    scale = float(jnp.abs(F1).max())
    np.testing.assert_allclose(
        np.asarray(F8), np.asarray(F1), atol=2e-3 * scale
    )
    np.testing.assert_allclose(
        np.asarray(G8), np.asarray(G1), atol=2e-3 * scale
    )


def test_sharded_jits_in_training_step():
    a, x, b, y = _clouds(2000, 2000, seed=4)
    mesh = points_mesh(4)

    @jax.jit
    def step(x):
        v, g = jax.value_and_grad(
            lambda x: sinkhorn_multiscale_sharded(a, x, b, y, mesh=mesh, **KW)
        )(x)
        return v, x - 100.0 * g

    v0, x1 = step(x)
    v1, _ = step(x1)
    assert float(v1) < float(v0)


def test_sharded_p1_and_unbalanced():
    a, x, b, y = _clouds(2000, 2176, seed=5, uniform=False)
    # p=1: eps = blur directly, so blur must sit below the cluster scale
    # (~0.024 here) for the schedule to reach the fine phase.
    kw1 = dict(KW, p=1, blur=0.01)
    v1 = sinkhorn_multiscale(a, x, b, y, **kw1)
    v8 = sinkhorn_multiscale_sharded(a, x, b, y, mesh=points_mesh(4), **kw1)
    np.testing.assert_allclose(float(v8), float(v1), rtol=2e-4)

    kwu = dict(KW, reach=0.3)
    vu1 = sinkhorn_multiscale(a, x, b, y, **kwu)
    vu8 = sinkhorn_multiscale_sharded(a, x, b, y, mesh=points_mesh(4), **kwu)
    np.testing.assert_allclose(float(vu8), float(vu1), rtol=1e-4)


def test_sharded_last_iteration_jump():
    # blur ~ diameter: the schedule ends at the jump, so there is no fine
    # phase to shard — the (replicated) differentiable extrapolation is
    # the whole tail, matching the single-device backend.
    a, x, b, y = _clouds(2000, 2000, seed=6)
    kw = dict(p=2, blur=1.0, diameter=1.5, scaling=0.5)
    v1 = sinkhorn_multiscale(a, x, b, y, **kw)
    v4 = sinkhorn_multiscale_sharded(a, x, b, y, mesh=points_mesh(4), **kw)
    np.testing.assert_allclose(float(v4), float(v1), rtol=1e-5)

    g1 = jax.grad(lambda x: sinkhorn_multiscale(a, x, b, y, **kw))(x)
    g4 = jax.grad(
        lambda x: sinkhorn_multiscale_sharded(
            a, x, b, y, mesh=points_mesh(4), **kw
        )
    )(x)
    scale = np.abs(np.asarray(g1)).max()
    np.testing.assert_allclose(
        np.asarray(g4), np.asarray(g1), atol=1e-5 * scale
    )


def test_sharded_labels():
    # User-supplied cluster labels reorder the blocks exactly like the
    # single-device backend (label-coherent Hilbert sort).
    rng = np.random.RandomState(7)
    a, x, b, y = _clouds(2000, 2176, seed=7, uniform=False)
    lx = jnp.asarray(rng.randint(0, 4, size=2000), jnp.int32)
    ly = jnp.asarray(rng.randint(0, 4, size=2176), jnp.int32)
    v1 = sinkhorn_multiscale(a, x, b, y, labels_x=lx, labels_y=ly, **KW)
    v8 = sinkhorn_multiscale_sharded(
        a, x, b, y, mesh=points_mesh(4), labels_x=lx, labels_y=ly, **KW
    )
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-4)


def test_sharded_mid_phase_parity(monkeypatch):
    # Force the intermediate scale on a small cloud: the sharded backend
    # must run the same pooled mid phase + tile-geometry masks as the
    # single-device cascade.
    import geomloss_tpu.models.multiscale as msmod

    monkeypatch.setattr(msmod, "N_FINE_OK", 640)
    a, x, b, y = _clouds(2048, 2560, seed=8)
    v1 = sinkhorn_multiscale(a, x, b, y, **KW)
    v8 = sinkhorn_multiscale_sharded(a, x, b, y, mesh=points_mesh(4), **KW)
    monkeypatch.setattr(msmod, "N_FINE_OK", 1 << 20)
    v_two_scale = sinkhorn_multiscale(a, x, b, y, **KW)
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-4)
    # and the cascade itself stays consistent with the plain descent
    # (loose: N_FINE_OK=1024 is a stress setting far below the real
    # threshold; the single-device suite pins cascade-vs-dense at 5e-3
    # in the realistic regime, tests/test_multiscale_structure.py):
    np.testing.assert_allclose(float(v1), float(v_two_scale), rtol=2e-2)
