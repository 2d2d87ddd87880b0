"""``geomloss_tpu.ot`` — POT-compatible optimal transport solvers.

Mirrors the reference's ``geomloss.ot`` module
(``/root/reference/src/geomloss/ot/__init__.py``): ``solve`` /
``solve_batch`` on explicit cost matrices, ``solve_sample`` on point
clouds, ``solve_grid`` on images/volumes (incl. the documented ``axes``
/ ``periodic`` geometry, implemented here), the Wasserstein barycenter
solvers ``barycenter`` (fixed support) / ``barycenter_sample`` (free
support) / ``barycenter_grid`` — all three non-functional stubs
upstream — and the lazily-cached ``OTResult`` family with
``LinearOperator`` plans.
"""

from .result import LinearOperator, OTResult
from .solve_matrix import OTResultMatrix, barycenter, solve, solve_batch
from .sample_impl import (
    OTResultSample,
    barycenter_sample,
    solve_sample,
    solve_sample_batch,
)


def __getattr__(name):
    if name in ("solve_grid", "barycenter_grid", "OTResultGrid"):
        from . import grid_impl

        return getattr(grid_impl, name)
    raise AttributeError(f"module 'geomloss_tpu.ot' has no attribute {name!r}")


__all__ = [
    "LinearOperator",
    "OTResult",
    "OTResultMatrix",
    "OTResultSample",
    "solve",
    "solve_batch",
    "solve_sample",
    "solve_sample_batch",
    "solve_grid",
    "barycenter",
    "barycenter_sample",
    "barycenter_grid",
]
