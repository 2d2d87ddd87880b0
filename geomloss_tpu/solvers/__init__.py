"""Abstract solvers: annealing schedules, Sinkhorn loops, barycenters."""

from .barycenters import barycenter_iteration, sinkhorn_barycenter_loop
from .sinkhorn_ot import sinkhorn_initialization
from .sinkhorn_ot import sinkhorn_loop as sinkhorn_loop_ot
from .unbalanced import dot_products
from .unbalanced import sinkhorn_cost as sinkhorn_cost_ot
from .annealing import (
    annealing_parameters,
    dampening,
    epsilon_schedule,
    max_diameter,
    scaling_parameters,
)
from .sinkhorn_loop import (
    log_weights,
    scal,
    sinkhorn_cost,
    sinkhorn_loop,
    unbalanced_weight,
)

__all__ = [
    "annealing_parameters",
    "dampening",
    "epsilon_schedule",
    "max_diameter",
    "scaling_parameters",
    "log_weights",
    "scal",
    "sinkhorn_cost",
    "sinkhorn_loop",
    "unbalanced_weight",
    "sinkhorn_loop_ot",
    "sinkhorn_initialization",
    "sinkhorn_cost_ot",
    "dot_products",
    "sinkhorn_barycenter_loop",
    "barycenter_iteration",
]
