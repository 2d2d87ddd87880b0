"""Multi-chip scale-out: device meshes, ring-softmin collectives, and
the row-sharded multiscale fine phase."""

from .multiscale_sharded import sinkhorn_multiscale_sharded
from .ring import (
    kernel_ring,
    points_mesh,
    ring_lse,
    ring_matvec,
    ring_softmin,
    sinkhorn_ring,
)

__all__ = [
    "kernel_ring",
    "points_mesh",
    "ring_lse",
    "ring_matvec",
    "ring_softmin",
    "sinkhorn_ring",
    "sinkhorn_multiscale_sharded",
]
