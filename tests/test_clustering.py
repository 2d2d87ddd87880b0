"""Eager voxel-grid clustering utilities (KeOps cluster-tools parity)."""

import numpy as np

import jax.numpy as jnp

from geomloss_tpu.ops.clustering import (
    cluster_ranges_centroids,
    clusterize,
    grid_cluster,
)


def test_grid_cluster_groups_nearby_points():
    x = np.array([[0.0, 0.0], [0.01, 0.01], [1.0, 1.0], [1.02, 1.01]])
    labels = grid_cluster(x, scale=0.1)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]
    assert labels.min() == 0  # compacted labels


def test_cluster_ranges_centroids():
    x = np.array([[0.0], [1.0], [0.2], [1.4]])
    labels = np.array([0, 1, 0, 1])
    w = np.array([1.0, 1.0, 3.0, 1.0])
    ranges, centroids, tot_w = cluster_ranges_centroids(x, labels, weights=w)
    np.testing.assert_array_equal(ranges, [[0, 2], [2, 4]])
    np.testing.assert_allclose(tot_w, [4.0, 2.0])
    # Weighted centroids: (1*0 + 3*0.2)/4 and (1 + 1.4)/2:
    np.testing.assert_allclose(centroids[:, 0], [0.15, 1.2])


def test_clusterize_roundtrip():
    rng = np.random.RandomState(0)
    N = 200
    x = rng.rand(N, 3)
    a = rng.rand(N)
    (a_c, a_s), (x_c, x_s), ranges, perm = clusterize(a, x, scale=0.25)

    # Total mass is preserved at both resolutions:
    np.testing.assert_allclose(float(jnp.sum(a_c)), a.sum(), rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(a_s)), a.sum(), rtol=1e-12)
    # The permutation de-sorts the sorted cloud back to the original:
    x_s_np = np.asarray(x_s)
    perm_np = np.asarray(perm)
    np.testing.assert_allclose(x_s_np, x[perm_np])
    # Clusters are contiguous: ranges cover [0, N):
    assert ranges[0, 0] == 0 and ranges[-1, 1] == N
    assert (ranges[1:, 0] == ranges[:-1, 1]).all()


def test_clusterize_no_scale_passthrough():
    x = np.random.RandomState(1).rand(10, 2)
    a = np.full(10, 0.1)
    (a_list, x_list, ranges, perm) = clusterize(a, x)
    assert len(a_list) == 1 and len(x_list) == 1 and perm is None
