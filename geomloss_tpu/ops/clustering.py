r"""Voxel-grid clustering for multiscale solvers.

TPU-native replacement for the KeOps cluster utilities used by the
reference (``grid_cluster``, ``cluster_ranges_centroids``, ``sort_clusters``
— imported at ``/root/reference/src/geomloss/_legacy/sinkhorn_samples.py:7-15``
and wrapped by ``clusterize`` at ``:453-490``).

Clustering runs **eagerly on the host** (NumPy): the number of occupied
voxels is data-dependent, so resolving it before tracing is what keeps
every downstream jit static-shaped. The returned arrays are device arrays
sorted so that clusters are contiguous in memory — the layout both KeOps
block-sparse reductions and our block-masked Pallas kernels rely on.
"""



import numpy as np
import jax.numpy as jnp

__all__ = ["grid_cluster", "cluster_ranges_centroids", "clusterize"]


def grid_cluster(x, scale) -> np.ndarray:
    """Voxel-grid labels: points in the same cube of side ``scale`` share a label.

    Args:
        x: ``(N, D)`` concrete array.
        scale: voxel side length.

    Returns:
        ``(N,)`` int64 label array (labels are compacted to ``0..K-1`` in
        first-appearance-of-sorted-voxel order, like KeOps' ``grid_cluster``).
    """
    x = np.asarray(x)
    mins = x.min(axis=0)
    grid_idx = np.floor((x - mins) / scale).astype(np.int64)
    dims = grid_idx.max(axis=0) + 1
    raveled = np.ravel_multi_index(tuple(grid_idx.T), tuple(dims))
    _, labels = np.unique(raveled, return_inverse=True)
    return labels


def cluster_ranges_centroids(x, labels, weights=None):
    """Per-cluster ``[start, end)`` ranges, weighted centroids and total weights.

    Assumes nothing about ``labels`` order; ranges refer to the *sorted*
    layout. Mirrors KeOps ``cluster_ranges_centroids``.
    """
    x = np.asarray(x)
    labels = np.asarray(labels)
    N, D = x.shape
    K = int(labels.max()) + 1 if N else 0
    w = np.ones((N,), dtype=x.dtype) if weights is None else np.asarray(weights)

    tot_w = np.zeros((K,), dtype=np.float64)
    np.add.at(tot_w, labels, w.astype(np.float64))
    centroids = np.zeros((K, D), dtype=np.float64)
    np.add.at(centroids, labels, w[:, None].astype(np.float64) * x.astype(np.float64))
    centroids = centroids / np.maximum(tot_w[:, None], 1e-300)

    counts = np.bincount(labels, minlength=K)
    ends = np.cumsum(counts)
    starts = ends - counts
    ranges = np.stack([starts, ends], axis=1).astype(np.int64)

    return ranges, centroids.astype(x.dtype), tot_w.astype(x.dtype)


def clusterize(a, x, scale=None, labels=None):
    """Cluster a measure ``(a, x)`` on a voxel grid of side ``scale``.

    Matches the reference's ``clusterize`` (``sinkhorn_samples.py:453-490``):
    returns coarse (centroid) and fine (sorted) versions of the measure,
    the cluster ranges, and the sorting permutation (needed to de-sort
    dual potentials).

    Returns:
        ``(a_coarse, a_sorted), (x_coarse, x_sorted), ranges, perm``
        — all device arrays except ``ranges``/``perm`` (NumPy, static
        bookkeeping).
    """
    if labels is None and scale is None:
        return ([jnp.asarray(a)], [jnp.asarray(x)], [], None)

    a_np = np.asarray(a)
    x_np = np.asarray(x)
    lab = grid_cluster(x_np, scale) if labels is None else np.asarray(labels)

    ranges, centroids, tot_w = cluster_ranges_centroids(x_np, lab, weights=a_np)

    perm = np.argsort(lab, kind="stable")
    a_sorted = a_np[perm]
    x_sorted = x_np[perm]

    return (
        (jnp.asarray(tot_w), jnp.asarray(a_sorted)),
        (jnp.asarray(centroids), jnp.asarray(x_sorted)),
        ranges,
        jnp.asarray(perm),
    )
