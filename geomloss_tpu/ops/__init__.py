"""Compute primitives: costs, softmin/LSE kernels, clustering, grid ops."""

from .costs import cost_routines, distances, squared_distances
from .softmin import gibbs_apply, lse_points, softmin_dense, softmin_points

__all__ = [
    "cost_routines",
    "distances",
    "squared_distances",
    "gibbs_apply",
    "lse_points",
    "softmin_dense",
    "softmin_points",
]
