"""Ground cost functions between point clouds.

TPU notes
---------
The pairwise (squared) Euclidean distance matrix is computed through the
expansion ``|x|^2 - 2<x,y> + |y|^2`` so that the dominant term is a plain
matrix product that XLA maps onto the MXU (the reference uses the same
expansion on dense torch tensors, see
``/root/reference/src/geomloss/_legacy/utils.py:26-61``).

Everything here broadcasts over arbitrary leading batch dimensions.
"""

import jax.numpy as jnp
from jax import lax

__all__ = [
    "squared_distances",
    "distances",
    "cost_routines",
    "halved_sqdist",
]

#: TPU MXUs multiply in bfloat16 by default, which injects ~1e-2-scale noise
#: into pairwise distances computed through the dot-product expansion (and
#: thence ~x2 relative errors into p=1 gradients, measured). All matmuls on
#: raw point coordinates therefore request full float32 multiplication.
COORD_PRECISION = lax.Precision.HIGHEST

#: Numerical floor applied before taking square roots of squared distances,
#: matching the reference's ``clamp_min(, 1e-8)`` (``_legacy/utils.py:61``).
SQDIST_FLOOR = 1e-8


def squared_distances(x, y):
    """Full pairwise squared distances ``|x_i - y_j|^2``.

    Args:
        x: ``(..., N, D)`` array.
        y: ``(..., M, D)`` array.

    Returns:
        ``(..., N, M)`` array of squared Euclidean distances.
    """
    D_xx = (x * x).sum(-1)[..., :, None]  # (..., N, 1)
    D_yy = (y * y).sum(-1)[..., None, :]  # (..., 1, M)
    D_xy = jnp.matmul(
        x, jnp.swapaxes(y, -1, -2), precision=COORD_PRECISION
    )  # (..., N, M) on the MXU
    return D_xx - 2 * D_xy + D_yy


def distances(x, y):
    """Pairwise Euclidean distances, with a small clamp before the sqrt."""
    return jnp.sqrt(jnp.clip(squared_distances(x, y), min=SQDIST_FLOOR))


def halved_sqdist(x, y):
    """C(x, y) = |x - y|^2 / 2, the p=2 ground cost."""
    return squared_distances(x, y) / 2


#: Ground costs C(x,y) = |x-y|^p / p, as in the reference
#: (``_legacy/sinkhorn_samples.py:26-29``).
cost_routines = {
    1: distances,
    2: halved_sqdist,
}
