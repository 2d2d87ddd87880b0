r"""Sinkhorn divergence between sampled measures — point-cloud backends.

Replaces the reference's three backends
(``/root/reference/src/geomloss/_legacy/sinkhorn_samples.py``):

* ``sinkhorn_tensorized`` (``:74-221``) — dense cost matrices, XLA.
* ``sinkhorn_online`` (``:349-424``) — KeOps streaming LSE becomes our
  fused streaming softmin (Pallas on TPU, chunked scan elsewhere).
* ``sinkhorn_multiscale`` (``:547-681``) — coarse-to-fine with kernel
  truncation (see ``multiscale.py``).

Gradient semantics match the reference: cost structures are built with a
*detached* second argument (reference ``:179-185`` / ``:392-393``), and the
loop itself only back-propagates through the final extrapolation.
"""

from functools import partial

import jax

from jax import lax

import jax.numpy as jnp

from ..ops.costs import cost_routines
from ..ops.softmin import (
    sinkhorn_step_points,
    softmin_dense,
    softmin_extrapolation,
    softmin_extrapolation_sym,
    softmin_points,
)
from ..solvers.annealing import scaling_parameters
from ..solvers.sinkhorn_loop import log_weights, sinkhorn_cost, sinkhorn_loop

__all__ = ["sinkhorn_tensorized", "sinkhorn_online"]

#: Opt-in switch for the warm-bf16 annealing sweeps below. OFF by
#: default since round 5: the committed round-4 measurement
#: (PROFILE_PHASES.jsonl ``dense_pair_step``: exact 69.0 ms vs warm
#: 70.5 ms at N=1e5) showed the lever is dead on v5e — the split-operand
#: exact path is MXU-bound at the same throughput, so the bf16 sweeps
#: were pure approximation risk for zero speedup. The schedule logic and
#: its tests stay for hardware where plain-bf16 wins.
WARM_BF16 = False

#: Precision schedule for the online backend's warm annealing sweeps
#: (p=2, built-in cost): an iteration runs on plain-bf16 MXU scores when
#: its temperature satisfies ``eps >= WARM_NOISE_FACTOR * noise`` with
#: ``noise ~ 2^-8 (diam/2)^2`` (the bf16 dot rounding on centered
#: clouds), i.e. the exponent perturbation stays below 1%...
WARM_NOISE_FACTOR = 100.0
#: ... and at least this many exact closing iterations remain: each
#: averaged exact update roughly halves the leftover potential offset,
#: so the handoff error is contracted well under the f32 solver noise
#: before the (always exact) differentiable extrapolation.
WARM_EXACT_TAIL = 6


def sinkhorn_tensorized(
    a,
    x,
    b,
    y,
    p=2,
    blur=0.05,
    reach=None,
    diameter=None,
    scaling=0.5,
    cost=None,
    debias=True,
    potentials=False,
    **kwargs,
):
    """Dense-XLA Sinkhorn divergence on batched point clouds.

    Args:
        a: ``(B, N)`` weights; x: ``(B, N, D)`` points;
        b: ``(B, M)`` weights; y: ``(B, M, D)`` points.
        cost: optional callable ``(B,N,D),(B,M,D) -> (B,N,M)``.

    Returns:
        ``(B,)`` divergence values, or a pair of ``(B, N)`` / ``(B, M)``
        potentials when ``potentials=True``.
    """
    if cost is None:
        cost = cost_routines[p]

    sg = lax.stop_gradient
    C_xy = cost(x, sg(y))  # (B, N, M)
    C_yx = cost(y, sg(x))  # (B, M, N)
    C_xx = cost(x, sg(x)) if debias else None
    C_yy = cost(y, sg(y)) if debias else None

    diameter, eps, eps_list, rho = scaling_parameters(
        x, y, p, blur, reach, diameter, scaling
    )

    f_aa, g_bb, g_ab, f_ba = sinkhorn_loop(
        softmin_dense,
        log_weights(a),
        log_weights(b),
        C_xx,
        C_yy,
        C_xy,
        C_yx,
        eps_list,
        rho,
        debias=debias,
    )

    if potentials == "raw":
        # Same convention as sinkhorn_online: the undebiased 4-tuple, fit
        # for warm starting (init_potentials=).
        return f_ba, g_ab, f_aa, g_bb

    return sinkhorn_cost(
        eps,
        rho,
        a,
        b,
        f_aa,
        g_bb,
        g_ab,
        f_ba,
        batch=True,
        debias=debias,
        potentials=potentials,
    )


def sinkhorn_online(
    a,
    x,
    b,
    y,
    p=2,
    blur=0.05,
    reach=None,
    diameter=None,
    scaling=0.5,
    cost=None,
    debias=True,
    potentials=False,
    impl="auto",
    init_potentials=None,
    warm_start_iters=3,
    **kwargs,
):
    """Streaming (O(N+M) memory) Sinkhorn divergence on batched point clouds.

    The cost matrices stay implicit: each softmin call fuses the pairwise
    cost with an online log-sum-exp (Pallas kernel on TPU). This is the
    TPU-native equivalent of the reference's KeOps ``LazyTensor`` backend.

    Warm starting (an extension over the reference): pass the raw 4-tuple
    ``init_potentials = (f_ba, g_ab, f_aa, g_bb)`` from a previous solve
    (obtained with ``potentials="raw"``) to skip the epsilon-annealing and
    run only ``warm_start_iters`` iterations at the target temperature —
    the natural mode for gradient flows where the clouds move slowly.
    """
    # An extension over the reference: its online backend only accepts
    # KeOps formula strings (``_legacy/sinkhorn_samples.py:316-334``); any
    # traced JAX callable streams through the chunked softmin here.
    softmin = partial(softmin_points, p=p, impl=impl, cost=cost)

    # For the built-in costs, the annealing loop runs on a *fused* step:
    # both softmin directions of each Jacobi iteration from a single pass
    # over the pair interactions (half the sweeps of the reference's four
    # KeOps launches per iteration — see ops/softmin.py).
    if cost is None:

        def fused_step(eps, C_xy, C_yx, a_log, b_log, f, g, sym=False,
                       exact=True):
            x_, y_ = C_xy[0], C_yx[0]
            if x_.ndim == 3:  # static batch axis: unroll (B is small)
                outs = []
                for i in range(x_.shape[0]):
                    xi, lai, fi = x_[i], a_log[i], f[i]
                    # Preserve object identity for the symmetric problems
                    # (routes to the upper-triangle kernel):
                    yi, lbi, gi = (xi, lai, fi) if sym else (y_[i], b_log[i], g[i])
                    outs.append(
                        sinkhorn_step_points(
                            eps, xi, yi, lai, lbi, fi, gi,
                            p=p, impl=impl, sym=sym, exact=exact,
                        )
                    )
                S_xy = jnp.stack([o[0] for o in outs])
                S_yx = None if sym else jnp.stack([o[1] for o in outs])
                return S_xy, S_yx
            return sinkhorn_step_points(
                eps, x_, y_, a_log, b_log, f, g, p=p, impl=impl, sym=sym,
                exact=exact,
            )

        def _unbatch(fn, *args):
            if args[0].ndim == 3:  # static batch axis: unroll (B is small)
                outs = [fn(*(a[i] for a in args)) for i in range(args[0].shape[0])]
                if isinstance(outs[0], tuple):
                    return tuple(jnp.stack([o[d] for o in outs]) for d in range(len(outs[0])))
                return jnp.stack(outs)
            return fn(*args)

        def fused_last(
            eps, damping, C_xy, C_yx, C_xx, C_yy,
            a_log, b_log, f_ba, g_ab, f_aa, g_bb,
        ):
            # Differentiable fused extrapolation: gradients flow to x / y
            # through their own direction only (detached-cost convention).
            sg = lax.stop_gradient
            x_, y_ = C_xy[0], C_yx[0]
            S_xy, S_yx = _unbatch(
                lambda *t: softmin_extrapolation(*t, eps, p, impl),
                x_, y_, sg(f_ba), sg(g_ab), sg(a_log), sg(b_log),
            )
            f_new, g_new = damping * S_xy, damping * S_yx
            if debias:
                S_xx = _unbatch(
                    lambda *t: softmin_extrapolation_sym(*t, eps, p, impl),
                    C_xx[0], sg(f_aa), sg(a_log),
                )
                S_yy = _unbatch(
                    lambda *t: softmin_extrapolation_sym(*t, eps, p, impl),
                    C_yy[0], sg(g_bb), sg(b_log),
                )
                f_aa, g_bb = damping * S_xx, damping * S_yy
            return f_new, g_new, f_aa, g_bb

    else:
        fused_step = None
        fused_last = None

    sg = lax.stop_gradient

    # Center the clouds on their detached joint mean: pairwise costs are
    # translation-invariant, gradients pass through unchanged, and the
    # Pallas dot-expansion's score noise (f32-split ~2^-24, plain-bf16
    # warm sweeps ~2^-9, both relative to |x||y|) then scales with the
    # *diameter* instead of the distance to the origin.
    ctr = sg(0.5 * (x.mean(axis=-2, keepdims=True) + y.mean(axis=-2, keepdims=True)))
    x, y = x - ctr, y - ctr

    C_xy, C_yx = (x, sg(y)), (y, sg(x))
    C_xx, C_yy = ((x, sg(x)), (y, sg(y))) if debias else (None, None)

    if init_potentials is not None:
        eps = blur**p
        rho = None if reach is None else reach**p
        eps_list = [eps] * warm_start_iters
        # The max-pass-free absorbed fused step assumes potentials produced
        # by an averaged update on THESE clouds (the W <= 1 bound); external
        # warm-start potentials can overflow exp2 when the clouds moved.
        # Route the warm-start iterations through the max-shifted two-pass
        # LSE instead (a few iterations — negligible cost; the fused
        # differentiable extrapolation stays: it runs after an averaged
        # update at the same eps, which restores the bound).
        fused_step = None
    else:
        diameter, eps, eps_list, rho = scaling_parameters(
            x, y, p, blur, reach, diameter, scaling
        )

    # Precision schedule for the warm annealing sweeps: with centered
    # clouds, a plain-bf16 MXU pass carries ~2^-8 (diam/2)^2 absolute
    # score noise. Warm iterations tolerate it (the exponent perturbation
    # is noise/eps <= 1/WARM_NOISE_FACTOR), any leftover potential offset
    # (~ the score noise, eps-free) is halved by each exact averaged
    # closing iteration, and the differentiable extrapolation is always
    # exact. p=1 stays exact: its cost is sqrt(expansion), so near-blur
    # distances would amplify the noise by 1/(2 d).
    warm_iters = 0
    if (
        WARM_BF16
        and fused_step is not None
        and init_potentials is None
        and p == 2
        and not isinstance(diameter, jnp.ndarray)
    ):
        noise = 2.0 ** -8 * (diameter / 2.0) ** 2
        warm_iters = sum(e >= WARM_NOISE_FACTOR * noise for e in eps_list)
        warm_iters = min(warm_iters, max(0, len(eps_list) - WARM_EXACT_TAIL))

    f_aa, g_bb, g_ab, f_ba = sinkhorn_loop(
        softmin,
        log_weights(a),
        log_weights(b),
        C_xx,
        C_yy,
        C_xy,
        C_yx,
        eps_list,
        rho,
        debias=debias,
        init_potentials=init_potentials,
        fused_step=fused_step,
        fused_last=fused_last,
        warm_iters=warm_iters,
    )

    if potentials == "raw":
        return f_ba, g_ab, f_aa, g_bb

    return sinkhorn_cost(
        eps,
        rho,
        a,
        b,
        f_aa,
        g_bb,
        g_ab,
        f_ba,
        batch=True,
        debias=debias,
        potentials=potentials,
    )
