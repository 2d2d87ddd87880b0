r"""The symmetric Sinkhorn loop with epsilon-scaling — solver core.

TPU-native re-design of the reference's ``sinkhorn_loop``
(``/root/reference/src/geomloss/_legacy/sinkhorn_divergence.py:258-628``):

* The iteration count is static (the annealing schedule is a Python list),
  so the hot loop compiles to a single fixed-length ``lax.scan`` whose body
  performs 2 (biased) or 4 (debiased) softmin calls.
* The envelope-theorem gradient trick ("no autograd through the loop, one
  differentiable extrapolation at the end", reference lines 418-434 and
  608-623) maps to ``lax.stop_gradient`` on every input of the scan,
  followed by one differentiable softmin call per potential with detached
  dual arguments.
* Multiscale jumps are Python-level (static) events: the loop is split
  into scan segments between jumps, with truncation/extrapolation hooks
  executed between segments.
"""

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from .annealing import dampening

__all__ = [
    "log_weights",
    "unbalanced_weight",
    "scal",
    "sinkhorn_cost",
    "sinkhorn_loop",
]


def log_weights(a):
    """log(a) with zero/negative weights clamped to -100000.

    Reference: ``_legacy/sinkhorn_divergence.py:61-65``.
    """
    return jnp.where(a > 0, jnp.log(jnp.maximum(a, 1e-30)), -100000.0)  # 1e-30 floor: TPU flushes subnormals, 0*inf grad = NaN


def scal(a, f, batch=False):
    """Weighted sum <a, f> (reference ``_legacy/utils.py:13-18``)."""
    if batch:
        B = a.shape[0]
        return (a.reshape(B, -1) * f.reshape(B, -1)).sum(-1)
    return jnp.dot(a.reshape(-1), f.reshape(-1))


@jax.custom_vjp
def _scale_fw_bw(x, fw, bw):
    return fw * x


def _scale_fw_bw_fwd(x, fw, bw):
    return fw * x, (fw, bw)


def _scale_fw_bw_bwd(res, g):
    fw, bw = res
    return bw * g, jnp.zeros_like(fw), jnp.zeros_like(bw)


_scale_fw_bw.defvjp(_scale_fw_bw_fwd, _scale_fw_bw_bwd)


def unbalanced_weight(x, *, eps, rho, mode="reference"):
    r"""Scaling of exponentiated potentials in the unbalanced Sinkhorn cost.

    The reference defines an ``UnbalancedWeight`` module whose *documented*
    behaviour (Sejourne et al., arXiv:1910.12958, Prop. 12) multiplies by
    ``rho + eps/2`` in the forward pass and ``rho + eps`` in the backward
    pass (``_legacy/sinkhorn_divergence.py:68-88``). However, since
    ``nn.Module.backward`` is not hooked into torch autograd, the
    reference's *effective* gradient uses ``rho + eps/2`` in both
    directions (verified empirically). ``mode="reference"`` (default)
    reproduces the effective behaviour; ``mode="sejourne"`` implements the
    documented asymmetric scaling via a custom VJP.
    """
    if mode == "reference":
        return (rho + eps / 2) * x
    elif mode == "sejourne":
        dt = jnp.asarray(x).dtype
        return _scale_fw_bw(
            x, jnp.asarray(rho + eps / 2, dt), jnp.asarray(rho + eps, dt)
        )
    raise ValueError(f"Unknown unbalanced_weight mode: {mode!r}")


# ==============================================================================
#  Sinkhorn cost from optimal dual potentials
# ==============================================================================


def sinkhorn_cost(
    eps,
    rho,
    a,
    b,
    f_aa,
    g_bb,
    g_ab,
    f_ba,
    batch=False,
    debias=True,
    potentials=False,
    unbalanced_mode="reference",
):
    r"""Combine dual potentials into the Sinkhorn divergence value.

    Faithful port of ``_legacy/sinkhorn_divergence.py:171-250`` — the four
    cases {debiased, biased} x {balanced, unbalanced}, plus the
    ``potentials`` early-exit.
    """
    if potentials:
        if debias:
            return f_ba - f_aa, g_ab - g_bb
        return f_ba, g_ab

    if debias:
        if rho is None:
            return scal(a, f_ba - f_aa, batch=batch) + scal(
                b, g_ab - g_bb, batch=batch
            )
        return scal(
            a,
            unbalanced_weight(
                jnp.exp(-f_aa / rho) - jnp.exp(-f_ba / rho),
                eps=eps,
                rho=rho,
                mode=unbalanced_mode,
            ),
            batch=batch,
        ) + scal(
            b,
            unbalanced_weight(
                jnp.exp(-g_bb / rho) - jnp.exp(-g_ab / rho),
                eps=eps,
                rho=rho,
                mode=unbalanced_mode,
            ),
            batch=batch,
        )
    else:
        if rho is None:
            return scal(a, f_ba, batch=batch) + scal(b, g_ab, batch=batch)
        return scal(
            a,
            unbalanced_weight(
                1 - jnp.exp(-f_ba / rho), eps=eps, rho=rho, mode=unbalanced_mode
            ),
            batch=batch,
        ) + scal(
            b,
            unbalanced_weight(
                1 - jnp.exp(-g_ab / rho), eps=eps, rho=rho, mode=unbalanced_mode
            ),
            batch=batch,
        )


# ==============================================================================
#  The loop
# ==============================================================================


def _detach(tree):
    return jax.tree.map(
        lambda v: lax.stop_gradient(v) if isinstance(v, jnp.ndarray) else v, tree
    )


def _scan_segment(
    softmin, carry, eps_seg, rho, C_xy, C_yx, C_xx, C_yy, a_log, b_log, debias,
    fused_step=None, exact=True,
):
    """Run a contiguous run of symmetric Sinkhorn iterations as one scan."""
    dtype = a_log.dtype
    eps_arr = jnp.asarray(eps_seg, dtype=dtype)
    damp_arr = jnp.asarray([dampening(e, rho) for e in eps_seg], dtype=dtype)

    def body(carry, eps_damp):
        eps, damp = eps_damp
        f_ba, g_ab, f_aa, g_bb = carry
        # Jacobi-style ("symmetric") updates computed from the previous
        # iterates, then averaged — reference lines 480-493:
        if fused_step is not None:
            # Both directions from one pass over the pair interactions
            # (see ops/softmin.py::sinkhorn_step_points).
            S_xy, S_yx = fused_step(
                eps, C_xy, C_yx, a_log, b_log, f_ba, g_ab, exact=exact
            )
            ft_ba, gt_ab = damp * S_xy, damp * S_yx
            if debias:
                ft_aa = damp * fused_step(
                    eps, C_xx, C_xx, a_log, a_log, f_aa, f_aa, sym=True,
                    exact=exact,
                )[0]
                gt_bb = damp * fused_step(
                    eps, C_yy, C_yy, b_log, b_log, g_bb, g_bb, sym=True,
                    exact=exact,
                )[0]
        else:
            ft_ba = damp * softmin(eps, C_xy, b_log + g_ab / eps)
            gt_ab = damp * softmin(eps, C_yx, a_log + f_ba / eps)
            if debias:
                ft_aa = damp * softmin(eps, C_xx, a_log + f_aa / eps)
                gt_bb = damp * softmin(eps, C_yy, b_log + g_bb / eps)
        f_ba = 0.5 * (f_ba + ft_ba)
        g_ab = 0.5 * (g_ab + gt_ab)
        if debias:
            f_aa = 0.5 * (f_aa + ft_aa)
            g_bb = 0.5 * (g_bb + gt_bb)
        return (f_ba, g_ab, f_aa, g_bb), None

    carry, _ = lax.scan(body, carry, (eps_arr, damp_arr))
    return carry


def sinkhorn_loop(
    softmin: Callable,
    a_logs: Any,
    b_logs: Any,
    C_xxs: Any,
    C_yys: Any,
    C_xys: Any,
    C_yxs: Any,
    eps_list: Sequence[float],
    rho: Optional[float],
    jumps: Sequence[int] = (),
    kernel_truncation: Optional[Callable] = None,
    truncate: float = 5,
    cost: Any = None,
    extrapolate: Optional[Callable] = None,
    debias: bool = True,
    last_extrapolation: bool = True,
    init_potentials: Optional[Any] = None,
    fused_step: Optional[Callable] = None,
    fused_last: Optional[Callable] = None,
    warm_iters: int = 0,
):
    r"""(Possibly multiscale) symmetric Sinkhorn loop with annealing.

    Same contract as the reference ``sinkhorn_loop``
    (``_legacy/sinkhorn_divergence.py:258-628``): returns the four optimal
    dual potentials ``(f_aa, g_bb, g_ab, f_ba)`` (``None`` for the first two
    when ``debias=False``). Gradients only flow through the final
    extrapolation (envelope theorem).

    ``eps_list`` and ``jumps`` must be static Python values. Between jumps,
    iterations run inside ``lax.scan``; jump iterations (softmin +
    truncation + extrapolation) are unrolled.

    ``init_potentials`` (an extension over the reference) warm-starts the
    loop with a ``(f_ba, g_ab[, f_aa, g_bb])`` tuple from a previous solve
    instead of the eps0 softmin initialization — performance extension;
    combined with a short constant schedule this makes gradient-flow steps
    much cheaper.

    ``fused_step(eps, C_ab, C_ba, a_log, b_log, f, g, sym=False,
    exact=True)``, when given, replaces the 2/4 per-iteration softmin
    calls inside scan segments (and the eps0 initialization) with
    backend-fused updates returning both raw softmin directions at once —
    same math, half the sweeps. Jump iterations and the final
    extrapolation still go through ``softmin``.

    ``warm_iters`` (static): the first ``warm_iters`` annealing
    iterations call ``fused_step`` with ``exact=False`` — on the Pallas
    backend that is a plain-bf16 MXU score pass (~6x less matrix work
    than the f32-exact split-operand expansion). Callers pick the count
    so that the bf16 score noise is negligible at those iterations' own
    temperatures AND enough exact closing iterations remain to contract
    any leftover perturbation (see ``models/sinkhorn_samples.py``).
    """
    if not isinstance(a_logs, list):
        a_logs, b_logs = [a_logs], [b_logs]
        C_xys, C_yxs = [C_xys], [C_yxs]
        if debias:
            C_xxs, C_yys = [C_xxs], [C_yys]

    Nits = len(eps_list)
    jumps = list(jumps)

    # --- Detached copies for the no-grad region -------------------------------
    a_logs_d = [_detach(v) for v in a_logs]
    b_logs_d = [_detach(v) for v in b_logs]
    C_xys_d = [_detach(v) for v in C_xys]
    C_yxs_d = [_detach(v) for v in C_yxs]
    if debias:
        C_xxs_d = [_detach(v) for v in C_xxs]
        C_yys_d = [_detach(v) for v in C_yys]

    k = 0  # scale index
    eps = eps_list[0]
    damping = dampening(eps, rho)
    a_log, b_log = a_logs_d[k], b_logs_d[k]
    C_xy, C_yx = C_xys_d[k], C_yxs_d[k]
    C_xx = C_xxs_d[k] if debias else None
    C_yy = C_yys_d[k] if debias else None

    # --- Initialization (reference lines 454-465) -----------------------------
    if init_potentials is not None:
        init = [lax.stop_gradient(v) for v in init_potentials]
        f_ba, g_ab = init[0], init[1]
        if debias:
            f_aa, g_bb = init[2], init[3]
        else:
            f_aa = jnp.zeros_like(f_ba)
            g_bb = jnp.zeros_like(g_ab)
    elif fused_step is not None:
        # The eps0 initialization is the fused step at zero potentials:
        ex0 = warm_iters <= 0
        zf, zg = jnp.zeros_like(a_log), jnp.zeros_like(b_log)
        S_xy, S_yx = fused_step(eps, C_xy, C_yx, a_log, b_log, zf, zg, exact=ex0)
        f_ba, g_ab = damping * S_xy, damping * S_yx
        if debias:
            f_aa = damping * fused_step(
                eps, C_xx, C_xx, a_log, a_log, zf, zf, sym=True, exact=ex0
            )[0]
            g_bb = damping * fused_step(
                eps, C_yy, C_yy, b_log, b_log, zg, zg, sym=True, exact=ex0
            )[0]
        else:
            f_aa = jnp.zeros_like(f_ba)
            g_bb = jnp.zeros_like(g_ab)
    else:
        g_ab = damping * softmin(eps, C_yx, a_log)
        f_ba = damping * softmin(eps, C_xy, b_log)
        if debias:
            f_aa = damping * softmin(eps, C_xx, a_log)
            g_bb = damping * softmin(eps, C_yy, b_log)
        else:
            f_aa = jnp.zeros_like(f_ba)
            g_bb = jnp.zeros_like(g_ab)

    carry = (f_ba, g_ab, f_aa, g_bb)

    # --- Main descent, segmented at jump indices ------------------------------
    # We execute indices [seg_start, jump] as: scan over [seg_start, jump]
    # then the jump logic after the update at index `jump`.
    boundaries = sorted(j for j in jumps if 0 <= j < Nits)
    seg_start = 0

    for jump in boundaries + [None]:
        seg_end = Nits if jump is None else jump + 1
        # Split each scan segment at the warm/exact precision boundary
        # (the `exact` flag is static per compiled kernel):
        cuts = [seg_start]
        if seg_start < warm_iters < seg_end:
            cuts.append(warm_iters)
        cuts.append(seg_end)
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            if hi > lo:
                carry = _scan_segment(
                    softmin,
                    carry,
                    eps_list[lo:hi],
                    rho,
                    C_xy,
                    C_yx,
                    C_xx,
                    C_yy,
                    a_log,
                    b_log,
                    debias,
                    fused_step=fused_step,
                    exact=lo >= warm_iters,
                )
        seg_start = seg_end
        if jump is None:
            break

        f_ba, g_ab, f_aa, g_bb = carry
        eps = eps_list[jump]
        damping = dampening(eps, rho)

        if jump == Nits - 1:
            # Last-iteration jump: extrapolate with autograd enabled and
            # skip the final extrapolation (reference lines 520-526). The
            # reference re-enables grad *before* extrapolating, so the
            # coarse log-weights feeding the extrapolation must be the
            # attached ones too (not just the fine-scale costs):
            a_log, b_log = a_logs[k], b_logs[k]
            C_xy_fine, C_yx_fine = C_xys[k + 1], C_yxs[k + 1]
            if debias:
                C_xx_fine, C_yy_fine = C_xxs[k + 1], C_yys[k + 1]
            last_extrapolation = False
        else:
            C_xy_fine, C_yx_fine = kernel_truncation(
                C_xy,
                C_yx,
                C_xys_d[k + 1],
                C_yxs_d[k + 1],
                f_ba,
                g_ab,
                eps,
                truncate=truncate,
                cost=cost,
            )
            if debias:
                C_xx_fine, _ = kernel_truncation(
                    C_xx,
                    C_xx,
                    C_xxs_d[k + 1],
                    C_xxs_d[k + 1],
                    f_aa,
                    f_aa,
                    eps,
                    truncate=truncate,
                    cost=cost,
                )
                C_yy_fine, _ = kernel_truncation(
                    C_yy,
                    C_yy,
                    C_yys_d[k + 1],
                    C_yys_d[k + 1],
                    g_bb,
                    g_bb,
                    eps,
                    truncate=truncate,
                    cost=cost,
                )

        # Cross-extrapolations must use the *previous* iterates in parallel:
        b_src, a_src = b_log, a_log
        f_ba, g_ab = (
            extrapolate(f_ba, g_ab, eps, damping, C_xy, b_src, C_xy_fine),
            extrapolate(g_ab, f_ba, eps, damping, C_yx, a_src, C_yx_fine),
        )
        if debias:
            f_aa = extrapolate(f_aa, f_aa, eps, damping, C_xx, a_src, C_xx_fine)
            g_bb = extrapolate(g_bb, g_bb, eps, damping, C_yy, b_src, C_yy_fine)

        k = k + 1
        a_log, b_log = a_logs_d[k], b_logs_d[k]
        C_xy, C_yx = C_xy_fine, C_yx_fine
        if debias:
            C_xx, C_yy = C_xx_fine, C_yy_fine
        carry = (f_ba, g_ab, f_aa, g_bb)

    f_ba, g_ab, f_aa, g_bb = carry

    # After the loop, the temperature is the final schedule value
    # (reference: the `for i, eps in enumerate(eps_list)` loop variable):
    eps = eps_list[-1]
    damping = dampening(eps, rho)

    # --- Differentiable last extrapolation (reference lines 608-623) ----------
    if last_extrapolation:
        sg = lax.stop_gradient
        if fused_last is not None:
            f_ba, g_ab, f_aa, g_bb = fused_last(
                eps,
                damping,
                C_xys[k],
                C_yxs[k],
                C_xxs[k] if debias else None,
                C_yys[k] if debias else None,
                a_logs[k],
                b_logs[k],
                f_ba,
                g_ab,
                f_aa,
                g_bb,
            )
        else:
            # Use the non-detached data at the current scale:
            C_xy_g, C_yx_g = C_xys[k], C_yxs[k]
            f_ba, g_ab = (
                damping * softmin(eps, C_xy_g, sg(b_logs[k] + g_ab / eps)),
                damping * softmin(eps, C_yx_g, sg(a_logs[k] + f_ba / eps)),
            )
            if debias:
                f_aa = damping * softmin(eps, C_xxs[k], sg(a_logs[k] + f_aa / eps))
                g_bb = damping * softmin(eps, C_yys[k], sg(b_logs[k] + g_bb / eps))

    if debias:
        return f_aa, g_bb, g_ab, f_ba
    return None, None, g_ab, f_ba
