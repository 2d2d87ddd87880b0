r"""Abstract (multiscale) Sinkhorn loop for debiased Wasserstein barycenters.

Re-implementation of
``/root/reference/src/geomloss/ot/_abstract_solvers/sinkhorn_barycenters.py``:
batched solution of ``argmin_A sum_k w_k * S_eps(A, B_k)`` on a fixed
support, with the Janati-Cuturi-Gramfort debiasing density and Feydy's
annealing/multiscale scheme.

TPU notes: within each scale the iterations run as one ``lax.scan``;
the ``backward_iterations`` tail is unrolled with gradients enabled
(everything before it is detached), reproducing the reference's envelope
shortcut.
"""

from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.typing import CostMatrices, DescentParameters

__all__ = ["barycenter_iteration", "sinkhorn_barycenter_loop"]


def barycenter_iteration(*, softmin, f_k, g_k, log_d, eps, C, log_b_k, w_k):
    """One symmetric Sinkhorn iteration for the barycenter problem
    (reference ``sinkhorn_barycenters.py:14-78``).

    This is the *single* barycenter iteration of the library: the matrix
    (``ot.barycenter``), grid (``ImagesBarycenter``) and abstract
    front-ends all call it with their own ``softmin`` adapter and cost
    descriptor ``C`` (dense matrices, integer grid exponent, point
    clouds, ...).

    Shapes: ``f_k, g_k, log_b_k`` are ``(B, K, ...)``; ``log_d`` is
    ``(B, 1, ...)``; ``w_k`` is ``(B, K)``.

    When ``C.xx is None`` the debiasing density is not updated and the
    barycenter is instead gauge-pinned to the simplex (the potentials'
    free additive constant otherwise leaves the mass unnormalized).
    """

    def pseudo_step(g_k):
        # From the measures to the barycenter:
        ft_k = softmin(eps, C.xy, log_b_k + g_k / eps)  # (B, K, ...)
        log_bar = (
            log_d - jnp.einsum("bk...,bk->b...", ft_k, w_k)[:, None, ...] / eps
        )
        if C.xx is None:
            log_bar = log_bar - jax.nn.logsumexp(
                log_bar, axis=tuple(range(2, log_bar.ndim)), keepdims=True
            )
        return ft_k, log_bar

    ft_k, log_bar = pseudo_step(g_k)

    # Symmetric Sinkhorn updates:
    gt_k = softmin(eps, C.yx, log_bar + f_k / eps)
    f_k = (f_k + ft_k) / 2
    g_k = (g_k + gt_k) / 2

    # Pseudo-step with the updated potentials:
    _, log_bar = pseudo_step(g_k)

    if C.xx is not None:
        # Update the de-biasing measure (Janati et al.'s correction):
        log_d = 0.5 * (log_d + log_bar + softmin(eps, C.xx, log_d) / eps)

    return f_k, g_k, log_d, log_bar


def sinkhorn_barycenter_loop(
    *,
    softmin: Callable,
    log_b_k_list: List[Any],
    w_k,
    C_list: List[CostMatrices],
    descent: DescentParameters,
    extrapolate: Optional[Callable] = None,
    backward_iterations: int = 5,
):
    """Multiscale symmetric Sinkhorn loop for debiased barycenters
    (reference ``sinkhorn_barycenters.py:81-314``).

    Returns the ``(B, 1, ...)`` barycenter masses at the finest scale.
    """
    eps_list = list(descent.eps_list)
    scale_list = list(descent.scale_list)
    n_iter = len(eps_list)

    sg = lax.stop_gradient
    log_b_k_list_d = [
        jax.tree.map(lambda v: sg(v) if isinstance(v, jnp.ndarray) else v, m)
        for m in log_b_k_list
    ]
    w_k_d = sg(w_k)

    scale = scale_list[0]
    log_b_k = log_b_k_list_d[scale]
    C = C_list[scale]
    eps = eps_list[0]

    f_k = softmin(eps, C.xy, log_b_k)
    g_k = softmin(eps, C.yx, log_b_k)

    log_d = jnp.sum(jnp.ones_like(log_b_k), axis=1, keepdims=True)  # (B,1,...)
    log_d = log_d - jax.nn.logsumexp(
        log_d, axis=tuple(range(2, log_d.ndim)), keepdims=True
    )

    log_bar = log_d  # placeholder until the first iteration

    def run_segment(state, idxs, log_b_k, C):
        f_k, g_k, log_d = state
        eps_arr = jnp.asarray([eps_list[i] for i in idxs], dtype=f_k.dtype)

        def body(state, e):
            f_k, g_k, log_d, _ = state
            f_k, g_k, log_d, log_bar = barycenter_iteration(
                softmin=softmin, f_k=f_k, g_k=g_k, log_d=log_d,
                eps=e, C=C, log_b_k=log_b_k, w_k=w_k_d,
            )
            return (f_k, g_k, log_d, log_bar), None

        init = (f_k, g_k, log_d, log_d - jnp.zeros_like(log_d))
        (f_k, g_k, log_d, log_bar), _ = lax.scan(body, init, eps_arr)
        return (f_k, g_k, log_d), log_bar

    # Split into constant-scale segments:
    segments = []
    start = 0
    for i in range(1, n_iter):
        if scale_list[i] != scale_list[i - 1]:
            segments.append((start, i))
            start = i
    segments.append((start, n_iter))

    for s_idx, (lo, hi) in enumerate(segments):
        scale = scale_list[lo]
        log_b_k = log_b_k_list_d[scale]
        C = C_list[scale]
        (f_k, g_k, log_d), log_bar = run_segment(
            (f_k, g_k, log_d), list(range(lo, hi)), log_b_k, C
        )

        if s_idx == len(segments) - 1:
            break

        # Jump to the next scale:
        i = hi - 1
        eps = eps_list[i]
        next_scale = scale_list[hi]
        C_fine = C_list[next_scale]

        f_k = extrapolate(
            self=f_k, other=g_k, log_weights=log_b_k,
            C=C.xy, C_fine=C_fine.xy, eps=eps, dampen=None,
        )
        g_k = extrapolate(
            self=g_k, other=f_k, log_weights=log_bar,
            C=C.yx, C_fine=C_fine.yx, eps=eps, dampen=None,
        )
        log_d = extrapolate(
            self=log_d, other=0 * log_d, log_weights=log_d,
            C=C.xx, C_fine=C_fine.xx, eps=eps, dampen=None,
        )

    # Differentiable tail (reference ``:301-312``):
    eps = eps_list[-1]
    scale = scale_list[-1]
    log_b_k_grad = log_b_k_list[scale]
    C = C_list[scale]
    f_k, g_k, log_d = sg(f_k), sg(g_k), sg(log_d)
    for _ in range(backward_iterations):
        f_k, g_k, log_d, log_bar = barycenter_iteration(
            softmin=softmin, f_k=f_k, g_k=g_k, log_d=log_d,
            eps=eps, C=C, log_b_k=log_b_k_grad, w_k=w_k,
        )

    return jnp.exp(log_bar)
