"""Spatial ordering primitives: radix sort correctness and Hilbert locality."""

import numpy as np

import jax.numpy as jnp

from geomloss_tpu.ops.block_sparse import tile_stats
from geomloss_tpu.ops.spatial import hilbert_key, radix_sort_perm


def test_radix_sort_matches_stable_argsort():
    rng = np.random.RandomState(0)
    keys = rng.randint(0, 1 << 30, size=5000).astype(np.int32)
    perm = np.asarray(radix_sort_perm(jnp.asarray(keys)))
    expected = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(perm, expected)


def test_radix_sort_with_duplicates_is_stable():
    rng = np.random.RandomState(1)
    keys = rng.randint(0, 7, size=3000).astype(np.int32)
    perm = np.asarray(radix_sort_perm(jnp.asarray(keys), total_bits=6))
    expected = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(perm, expected)


def _tile_radius(x, tile=256):
    key = hilbert_key(jnp.asarray(x))
    xs = x[np.asarray(radix_sort_perm(key))]
    _, r = tile_stats(jnp.asarray(xs), tile)
    return float(r.mean())


def test_hilbert_locality_2d():
    rng = np.random.RandomState(2)
    x = rng.rand(8192, 2).astype(np.float32)
    ideal = np.sqrt(256 / 8192 / np.pi)
    assert _tile_radius(x) < 2.0 * ideal  # within 2x of a perfect disc


def test_hilbert_locality_3d_volume():
    rng = np.random.RandomState(3)
    x = rng.rand(8192, 3).astype(np.float32)
    ideal = (256 / 8192 * 3 / (4 * np.pi)) ** (1 / 3)
    assert _tile_radius(x) < 2.5 * ideal


def test_hilbert_beats_morton_style_ordering():
    # Consecutive Hilbert cells are always spatially adjacent; a simple
    # row-major ordering is not. Check the mean consecutive-point distance:
    rng = np.random.RandomState(4)
    x = rng.rand(4096, 2).astype(np.float32)
    key_h = np.asarray(hilbert_key(jnp.asarray(x)))
    xs_h = x[np.argsort(key_h)]
    jump_h = np.linalg.norm(np.diff(xs_h, axis=0), axis=1).mean()

    key_rm = (x[:, 0] * 64).astype(int) * 64 + (x[:, 1] * 64).astype(int)
    xs_rm = x[np.argsort(key_rm)]
    jump_rm = np.linalg.norm(np.diff(xs_rm, axis=0), axis=1).mean()

    assert jump_h < 0.7 * jump_rm
