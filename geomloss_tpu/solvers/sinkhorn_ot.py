r"""New-generation abstract Sinkhorn loop (the ``ot.solve*`` solver core).

Re-implementation of
``/root/reference/src/geomloss/ot/_abstract_solvers/sinkhorn_ot.py``:
compared with the legacy loop (``sinkhorn_loop.py`` here), the softmin
signature separates log-weights from dual potentials —
``softmin(eps, log_b, C, g)`` — the schedule is a ``DescentParameters``
NamedTuple driven by ``scale_list``, and the initialization performs an
:math:`\varepsilon = \infty` softmin plus a symmetric constant offset
(reference ``sinkhorn_initialization``, ``:17-29``).

TPU notes: the descent runs as segmented ``lax.scan`` (one segment per
scale), all inputs detached; one differentiable extrapolation at the end
(envelope theorem).
"""

from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.typing import CostMatrices, DescentParameters, SinkhornPotentials
from .annealing import dampening as scalar_dampening
from .sinkhorn_loop import _detach
from .unbalanced import dampening, dot_products

__all__ = ["sinkhorn_initialization", "sinkhorn_loop"]


def sinkhorn_initialization(log_a, log_b, C_xy, softmin, dampen):
    """Optimal solution at eps = +infinity, with a symmetric constant offset.

    Reference: ``sinkhorn_ot.py:17-29``. N.B.: following the reference,
    the first axis of ``log_a`` is treated as a batch axis by the dot
    product — for unbatched ``(N,)`` inputs this degenerates to a
    pointwise offset, which we reproduce faithfully.
    """
    f_ba = softmin(float("inf"), log_b, C_xy, 0 * log_b)
    constant_offset = 0.5 * dot_products(jnp.exp(log_a), f_ba)
    f_ba = f_ba - constant_offset.reshape((-1,) + (1,) * (f_ba.ndim - 1))
    return dampen(f_ba)


def sinkhorn_loop(
    *,
    softmin: Callable,
    log_a_list: List[Any],
    log_b_list: List[Any],
    C_list: List[CostMatrices],
    descent: DescentParameters,
    kernel_truncation: Optional[Callable] = None,
    extrapolate: Optional[Callable] = None,
    debias: bool = True,
    last_extrapolation: bool = True,
) -> SinkhornPotentials:
    """Symmetric Sinkhorn loop with annealing and (optional) multiscale jumps.

    Same contract as the reference ``sinkhorn_loop`` (``sinkhorn_ot.py:32-447``).
    ``descent`` must contain static Python lists. Within each scale the
    iterations run inside one ``lax.scan``; gradients only flow through the
    final (detached-duals) extrapolation.
    """
    eps_list = list(descent.eps_list)
    rho_list = list(descent.rho_list)
    scale_list = list(descent.scale_list)
    n_iter = len(eps_list)
    assert len(rho_list) == n_iter and len(scale_list) == n_iter

    # Detached copies for the no-grad region:
    log_a_list_d = [_detach(v) for v in log_a_list]
    log_b_list_d = [_detach(v) for v in log_b_list]
    C_list_d = [_detach(v) for v in C_list]

    scale = scale_list[0]
    eps, rho = eps_list[0], rho_list[0]
    dampen = dampening(eps=eps, rho=rho)
    log_a, log_b, C = log_a_list_d[scale], log_b_list_d[scale], C_list_d[scale]

    # --- Initialization at eps = +infty ---------------------------------------
    f_ba = sinkhorn_initialization(log_a, log_b, C.xy, softmin, dampen)
    g_ab = sinkhorn_initialization(log_b, log_a, C.yx, softmin, dampen)
    if debias:
        f_aa = sinkhorn_initialization(log_a, log_a, C.xx, softmin, dampen)
        g_bb = sinkhorn_initialization(log_b, log_b, C.yy, softmin, dampen)
    else:
        f_aa, g_bb = jnp.zeros_like(f_ba), jnp.zeros_like(g_ab)

    carry = (f_ba, g_ab, f_aa, g_bb)

    def run_segment(carry, idxs, log_a, log_b, C):
        dtype = jnp.result_type(carry[0].dtype)
        eps_arr = jnp.asarray([eps_list[i] for i in idxs], dtype=dtype)
        # rho is constant or None within a segment in all supported uses;
        # we precompute the scalar damping factors:
        damp_arr = jnp.asarray(
            [scalar_dampening(eps_list[i], rho_list[i]) for i in idxs],
            dtype=dtype,
        )

        def body(carry, eps_damp):
            e, d = eps_damp
            f_ba, g_ab, f_aa, g_bb = carry
            ft_ba = d * softmin(e, log_b, C.xy, g_ab)
            gt_ab = d * softmin(e, log_a, C.yx, f_ba)
            if debias:
                ft_aa = d * softmin(e, log_a, C.xx, f_aa)
                gt_bb = d * softmin(e, log_b, C.yy, g_bb)
            f_ba, g_ab = 0.5 * (f_ba + ft_ba), 0.5 * (g_ab + gt_ab)
            if debias:
                f_aa, g_bb = 0.5 * (f_aa + ft_aa), 0.5 * (g_bb + gt_bb)
            return (f_ba, g_ab, f_aa, g_bb), None

        carry, _ = lax.scan(body, carry, (eps_arr, damp_arr))
        return carry

    # Split iteration indices into segments of constant scale:
    segments = []
    start = 0
    for i in range(1, n_iter):
        if scale_list[i] != scale_list[i - 1]:
            segments.append((start, i))
            start = i
    segments.append((start, n_iter))

    for s_idx, (lo, hi) in enumerate(segments):
        scale = scale_list[lo]
        log_a, log_b = log_a_list_d[scale], log_b_list_d[scale]
        carry = run_segment(carry, list(range(lo, hi)), log_a, log_b, C)

        if s_idx == len(segments) - 1:
            break

        # --- Jump to the next scale (reference lines 299-417) -----------------
        i = hi - 1  # index of the last iteration at this scale
        eps, rho = eps_list[i], rho_list[i]
        dampen = dampening(eps=eps, rho=rho)
        next_scale = scale_list[hi]
        f_ba, g_ab, f_aa, g_bb = carry

        # N.B.: a "jump after the final iteration" cannot occur in this
        # segmentation — every non-final segment ends at hi <= n_iter - 1,
        # so i <= n_iter - 2 here. A terminal scale change simply makes the
        # last segment run its iterations at the new scale (scale_list's
        # final-scale convention, annealing.py); the legacy loop
        # (sinkhorn_loop.py) keeps the explicit jumps-list branch instead.
        C_fine = C_list_d[next_scale]
        if kernel_truncation is not None:
            C_fine_xy, C_fine_yx = kernel_truncation(
                C=C.xy, CT=C.yx, C_fine=C_fine.xy, CT_fine=C_fine.yx,
                f=f_ba, g=g_ab, eps=eps,
            )
            if debias:
                C_fine_xx, _ = kernel_truncation(
                    C=C.xx, C_fine=C_fine.xx, f=f_aa, eps=eps
                )
                C_fine_yy, _ = kernel_truncation(
                    C=C.yy, C_fine=C_fine.yy, f=g_bb, eps=eps
                )
            else:
                C_fine_xx, C_fine_yy = None, None
            C_fine = CostMatrices(
                xx=C_fine_xx, yy=C_fine_yy, xy=C_fine_xy, yx=C_fine_yx
            )

        f_ba, g_ab = (
            extrapolate(
                self=f_ba, other=g_ab, log_weights=log_b,
                C=C.xy, C_fine=C_fine.xy, eps=eps, dampen=dampen,
            ),
            extrapolate(
                self=g_ab, other=f_ba, log_weights=log_a,
                C=C.yx, C_fine=C_fine.yx, eps=eps, dampen=dampen,
            ),
        )
        if debias:
            f_aa = extrapolate(
                self=f_aa, other=f_aa, log_weights=log_a,
                C=C.xx, C_fine=C_fine.xx, eps=eps, dampen=dampen,
            )
            g_bb = extrapolate(
                self=g_bb, other=g_bb, log_weights=log_b,
                C=C.yy, C_fine=C_fine.yy, eps=eps, dampen=dampen,
            )
        carry = (f_ba, g_ab, f_aa, g_bb)
        C = C_fine

    f_ba, g_ab, f_aa, g_bb = carry

    # Final temperature and damping:
    eps, rho = eps_list[-1], rho_list[-1]
    dampen = dampening(eps=eps, rho=rho)
    scale = scale_list[-1]

    if last_extrapolation:
        sg = lax.stop_gradient
        log_a_g, log_b_g = log_a_list[scale], log_b_list[scale]
        C_g = C_list[scale]
        f_ba, g_ab = (
            dampen(softmin(eps, sg(log_b_g), C_g.xy, sg(g_ab))),
            dampen(softmin(eps, sg(log_a_g), C_g.yx, sg(f_ba))),
        )
        if debias:
            f_aa = dampen(softmin(eps, sg(log_a_g), C_g.xx, sg(f_aa)))
            g_bb = dampen(softmin(eps, sg(log_b_g), C_g.yy, sg(g_bb)))

    if not debias:
        f_aa, g_bb = None, None

    return SinkhornPotentials(f_aa=f_aa, g_bb=g_bb, g_ab=g_ab, f_ba=f_ba)
