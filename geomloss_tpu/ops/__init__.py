"""Compute primitives: costs, softmin/LSE kernels, clustering, grid ops."""

from .block_sparse import (
    TileMask,
    build_tile_masks,
    gibbs_apply_sparse,
    lse_sparse,
    softmin_sparse,
)
from .clustering import cluster_ranges_centroids, clusterize, grid_cluster
from .costs import cost_routines, distances, squared_distances
from .grid import C_transform, log_dens, pyramid, softmin_grid, upsample
from .softmin import gibbs_apply, lse_points, softmin_dense, softmin_points

__all__ = [
    "cost_routines",
    "distances",
    "squared_distances",
    "gibbs_apply",
    "lse_points",
    "softmin_dense",
    "softmin_points",
    "TileMask",
    "build_tile_masks",
    "gibbs_apply_sparse",
    "lse_sparse",
    "softmin_sparse",
    "grid_cluster",
    "cluster_ranges_centroids",
    "clusterize",
    "log_dens",
    "pyramid",
    "upsample",
    "softmin_grid",
    "C_transform",
]
