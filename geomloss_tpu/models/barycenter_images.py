r"""Debiased Sinkhorn barycenters of images on 2D grids.

Re-implementation of
``/root/reference/src/geomloss/_legacy/wasserstein_barycenter_images.py``:
QuadTree pyramid, epsilon-scaling with ``scaling_N`` steps per scale
(``sigma <- sigma * 2^(-1/scaling_N)`` with a floor at ``blur``), the
debiasing density update
``d_log <- (d_log + bar_log + softmin(d_log)/eps) / 2``, and a final
handful of ``backward_iterations`` executed with autodiff enabled so that
gradients flow to the input measures and weights.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.grid import log_dens, pyramid, softmin_grid, upsample

__all__ = ["ImagesBarycenter", "barycenter_iteration"]


def _softmin(eps, p, h, D=2):  # grid softmin over the last D axes of (B,K,...)
    return softmin_grid(eps, p, h, D=D)


def barycenter_iteration(f_k, g_k, d_log, eps, p, ak_log, w_k, D=2):
    """One symmetric barycenter iteration (reference ``:6-31``).

    Thin grid adapter over the library's *single* shared barycenter
    iteration (``solvers.barycenters.barycenter_iteration``): the cost
    descriptor is the implicit separable grid kernel ``(p, D)`` and the
    softmin is the separable matmul-exp of ``ops/grid.py``.

    Shapes: f_k, g_k, ak_log are ``(B, K, *grid)``; d_log is
    ``(B, 1, *grid)``; w_k is ``(B, K)``. ``D`` is the number of grid axes
    (the reference only supports D=2).
    """
    from ..solvers.barycenters import barycenter_iteration as shared_iteration
    from ..utils.typing import CostMatrices

    desc = (p, D)
    C = CostMatrices(xy=desc, yx=desc, xx=desc)

    def softmin(eps, C_, h):
        return _softmin(eps, C_[0], h, C_[1])

    return shared_iteration(
        softmin=softmin, f_k=f_k, g_k=g_k, log_d=d_log, eps=eps, C=C,
        log_b_k=ak_log, w_k=w_k,
    )


def ImagesBarycenter(
    measures, weights, blur=0, p=2, scaling_N=10, backward_iterations=5
):
    """Debiased Sinkhorn barycenter of K grid measures (reference ``:34-93``).

    Args:
        measures: ``(B, K, N, N)`` batch of K normalized densities
            (also accepts 1D ``(B, K, N)`` and 3D ``(B, K, N, N, N)`` grids —
            an extension over the 2D-only reference).
        weights: ``(B, K)`` barycentric weights.
        blur: target blur; 0 means one pixel (``1/N``).
        p: cost exponent (2 for halved squared Euclidean).
        scaling_N: number of epsilon-scaling steps per pyramid scale.
        backward_iterations: extra iterations executed *with* gradient
            tracking at the finest scale (the envelope-theorem shortcut).

    Returns:
        ``(B, 1, N, N)`` barycenter densities.
    """
    a_k = measures  # (B, K, *grid)
    w_k = weights  # (B, K)
    D = a_k.ndim - 2  # number of grid axes

    if blur == 0:
        blur = 1 / measures.shape[-1]

    sg = lax.stop_gradient

    # --- No-grad multiscale descent -------------------------------------------
    a_k_d, w_k_d = sg(a_k), sg(w_k)

    ak_s = pyramid(a_k_d, D=D)[1:]  # drop the 1x1 level: 2x2, 4x4, ..., NxN
    ak_log_s = [log_dens(m) for m in ak_s]

    sigma = 1.0
    eps = sigma**p

    f_k = _softmin(eps, p, ak_log_s[0], D)
    g_k = _softmin(eps, p, ak_log_s[0], D)

    # Logarithm of the debiasing term: uniform density on the coarsest grid.
    grid_axes = tuple(range(2, 2 + D))
    d_log = jnp.ones_like(ak_log_s[0]).sum(axis=1, keepdims=True)  # (B,1,2...)
    d_log = d_log - jax.nn.logsumexp(d_log, axis=grid_axes, keepdims=True)

    for n, ak_log in enumerate(ak_log_s):
        for _ in range(scaling_N):
            eps = sigma**p
            f_k, g_k, d_log, bar_log = barycenter_iteration(
                f_k, g_k, d_log, eps, p, ak_log, w_k_d, D=D
            )
            sigma = max(sigma * 2 ** (-1 / scaling_N), blur)

        if n + 1 < len(ak_s):
            f_k = upsample(f_k, D=D)
            g_k = upsample(g_k, D=D)
            d_log = upsample(d_log, D=D)

    # --- Differentiable tail ---------------------------------------------------
    if backward_iterations > 0:
        ak_log = log_dens(a_k)  # finest scale, with gradients
        f_k, g_k, d_log = sg(f_k), sg(g_k), sg(d_log)
        for _ in range(backward_iterations):
            f_k, g_k, d_log, bar_log = barycenter_iteration(
                f_k, g_k, d_log, eps, p, ak_log, w_k, D=D
            )

    return jnp.exp(bar_log)
