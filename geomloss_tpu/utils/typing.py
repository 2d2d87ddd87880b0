"""Typed containers shared across the library.

TPU-native re-design of the protocol types of the reference library
(see /root/reference/src/geomloss/_typing.py:19-159): we keep the same
NamedTuple "data contracts" so that solvers, softmin implementations and
front-ends can be mixed freely, but all arrays are jax.Array pytrees so
that every container can cross a ``jax.jit`` boundary.
"""

from typing import Any, Callable, NamedTuple, Optional, Sequence, Union

import jax

Array = jax.Array
Scalar = Union[float, Array]


class CostMatrices(NamedTuple):
    """The four (explicit or implicit) cost structures used by a Sinkhorn solver.

    Mirrors the reference's ``CostMatrices`` (``_typing.py:19-23``).
    Each field is whatever object the paired ``softmin`` implementation
    understands: a dense ``(..., N, M)`` array, a tuple of point clouds
    ``(x, y)``, or a grid descriptor.
    """

    xy: Any  # C(x_i, y_j)
    yx: Any  # C(y_j, x_i)
    xx: Optional[Any] = None  # C(x_i, x_j), only used when debiasing
    yy: Optional[Any] = None  # C(y_i, y_j), only used when debiasing


class SinkhornPotentials(NamedTuple):
    """Optimal dual potentials (reference ``_typing.py:30-34``)."""

    f_aa: Optional[Array]  # potential for OT(a, a), supported by x
    g_bb: Optional[Array]  # potential for OT(b, b), supported by y
    g_ab: Optional[Array]  # potential for OT(a, b), supported by y
    f_ba: Optional[Array]  # potential for OT(a, b), supported by x


class DescentParameters(NamedTuple):
    """Static annealing schedule (reference ``_typing.py:42-45``).

    All three lists are plain Python lists computed *before* tracing, so
    the Sinkhorn loop always has a static number of iterations.
    """

    scale_list: Sequence[int]
    eps_list: Sequence[float]
    rho_list: Sequence[Optional[float]]


# Callable protocols (documentation-only aliases):
SoftMin = Callable  # softmin(eps, C, h) -> potential
Extrapolator = Callable
KernelTruncation = Callable
