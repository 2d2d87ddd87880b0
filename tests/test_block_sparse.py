"""Block-sparse kernel tests: full-mask equivalence with the dense softmin
(values + gradients), weight-aware mask construction, and the pointwise
coarse keep rule."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu.ops.block_sparse import (
    build_tile_masks,
    masks_from_coarse,
    softmin_sparse,
    tile_stats,
)
from geomloss_tpu.ops.softmin import softmin_points


def _problem(N=512, M=768, D=3, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(N, D), jnp.float32)
    y = jnp.asarray(rng.rand(M, D), jnp.float32)
    h = jnp.asarray(rng.randn(M) * 0.1, jnp.float32)
    return x, y, h


@pytest.mark.parametrize("p", [1, 2])
def test_full_mask_equals_dense(p):
    block = 128
    x, y, h = _problem()
    f = jnp.zeros(x.shape[0], jnp.float32)
    g = jnp.zeros(y.shape[0], jnp.float32)
    eps = 0.5
    mask = build_tile_masks(x, y, f, g, eps, p, truncate=1e6, block=block,
                            cap=y.shape[0] // block)
    sp = softmin_sparse(eps, (x, y, mask), h, p=p, block=block)
    dn = softmin_points(eps, (x, y), h, p=p, impl="dense")
    np.testing.assert_allclose(np.asarray(sp), np.asarray(dn), rtol=1e-5, atol=1e-5)


def test_full_mask_gradients_equal_dense():
    block = 128
    x, y, h = _problem(seed=1)
    f = jnp.zeros(x.shape[0], jnp.float32)
    g = jnp.zeros(y.shape[0], jnp.float32)
    eps = 0.5
    mask = build_tile_masks(x, y, f, g, eps, 2, truncate=1e6, block=block,
                            cap=y.shape[0] // block)

    gs = jax.grad(
        lambda x, y, h: (softmin_sparse(eps, (x, y, mask), h, block=block) ** 2).sum(),
        argnums=(0, 1, 2),
    )(x, y, h)
    gd = jax.grad(
        lambda x, y, h: (softmin_points(eps, (x, y), h, impl="dense") ** 2).sum(),
        argnums=(0, 1, 2),
    )(x, y, h)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3,
            atol=1e-3 * np.abs(np.asarray(b)).max() + 1e-9,
        )


def test_zero_weight_tiles_never_kept():
    block = 128
    x, y, h = _problem(seed=2)
    w_y = jnp.ones(y.shape[0]).at[2 * block:].set(0.0)  # tiles 2.. are padding
    f = jnp.zeros(x.shape[0])
    g = jnp.zeros(y.shape[0])
    mask = build_tile_masks(
        x, y, f, g, 0.5, 2, truncate=1e6, block=block,
        cap=y.shape[0] // block, w_x=None, w_y=w_y,
    )
    assert int(mask.counts.max()) <= 2
    assert np.all(np.asarray(mask.cols)[:, :2] <= 1)


def test_masks_from_coarse_matches_pointwise_rule():
    rng = np.random.RandomState(3)
    K = 32  # coarse blocks; 4 blocks per tile -> 8 tiles
    bpt = 4
    cx = jnp.asarray(rng.rand(K, 2))
    cy = jnp.asarray(rng.rand(K, 2))
    fc = jnp.asarray(rng.randn(K) * 0.01)
    gc = jnp.asarray(rng.randn(K) * 0.01)
    w = jnp.ones(K)
    eps, truncate = 0.01, 5.0

    mask = masks_from_coarse(cx, cy, fc, gc, w, w, eps, 2, truncate, bpt, cap=8)

    # Reference pointwise rule, pooled by hand:
    C = ((np.asarray(cx)[:, None, :] - np.asarray(cy)[None, :, :]) ** 2).sum(-1) / 2
    keep = (
        np.asarray(fc)[:, None] + np.asarray(gc)[None, :] - C + truncate * eps
    ) > 0
    keep_t = keep.reshape(8, bpt, 8, bpt).any((1, 3))
    for i in range(8):
        expected = set(np.nonzero(keep_t[i])[0])
        got = set(np.asarray(mask.cols)[i, : int(mask.counts[i])])
        if expected:
            assert got == expected


def test_tile_stats():
    x = jnp.asarray(np.array([[0.0, 0.0], [2.0, 0.0], [10.0, 0.0], [10.0, 2.0]]))
    cent, rad = tile_stats(x, 2)
    np.testing.assert_allclose(np.asarray(cent), [[1.0, 0.0], [10.0, 1.0]])
    np.testing.assert_allclose(np.asarray(rad), [1.0, 1.0])


@pytest.mark.parametrize("p", [1, 2])
def test_chunked_launch_matches_single(p, monkeypatch):
    """Tables beyond MAX_TABLE_ROWS rows split into per-chunk launches
    (including a ragged row count that needs internal padding)."""
    from geomloss_tpu.ops import block_sparse as bs

    block = 128
    x, y, h = _problem(N=640, M=640, seed=3)  # nI = 5 rows (ragged vs 2)
    f = jnp.zeros(x.shape[0], jnp.float32)
    g = jnp.zeros(y.shape[0], jnp.float32)
    eps = 0.3
    mask = build_tile_masks(x, y, f, g, eps, p, truncate=1e6, block=block,
                            cap=y.shape[0] // block)
    ref = softmin_sparse(eps, (x, y, mask), h, p=p, block=block)
    gs = jax.grad(
        lambda x, h: (softmin_sparse(eps, (x, y, mask), h, p=p, block=block) ** 2).sum(),
        argnums=(0, 1),
    )(x, h)

    # The kernels are jitted: clear the trace cache so the patched
    # MAX_TABLE_ROWS is seen (the global is read at trace time).
    monkeypatch.setattr(bs, "MAX_TABLE_ROWS", 2)  # 5 rows -> 3 chunks of 2
    jax.clear_caches()
    chunked = softmin_sparse(eps, (x, y, mask), h, p=p, block=block)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    gr = jax.grad(
        lambda x, h: (softmin_sparse(eps, (x, y, mask), h, p=p, block=block) ** 2).sum(),
        argnums=(0, 1),
    )(x, h)
    monkeypatch.setattr(bs, "MAX_TABLE_ROWS", 1024)
    jax.clear_caches()
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
