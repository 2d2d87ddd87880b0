r"""Soft-C-transforms (softmin) and Gibbs-kernel applications.

The softmin

.. math::
    f_i \gets -\varepsilon \log \sum_j \exp\big[h_j - C(x_i, y_j)/\varepsilon\big]

is the single hot operation of every Sinkhorn-like solver (reference:
``softmin_tensorized`` at ``_legacy/sinkhorn_samples.py:32-71`` and the KeOps
``softmin_online_lazytensor`` at ``:229-290``). On TPU we provide:

* ``softmin_dense`` — operates on a pre-computed dense cost matrix
  (the "tensorized" backend).
* ``softmin_points`` — fused cost + online log-sum-exp on raw point
  clouds, never materializing the ``N x M`` matrix. Three interchangeable
  implementations: ``dense`` (XLA, small problems), ``scan``
  (chunked ``lax.scan``, any backend, O(N * BM) memory) and ``pallas``
  (hand-written TPU kernel, see ``pallas_kernels.py``).

``softmin_points`` carries an analytic custom VJP: the derivative of a
log-sum-exp is a softmax-weighted reduction with the *same* streaming
structure as the forward pass (flash-attention-style backward), so
gradients also run in O(N + M) memory.

Design notes (TPU):
  - For ``p = 2`` the cost decomposes as
    ``C_ij = |x_i|^2/2 + |y_j|^2/2 - <x_i, y_j>`` so the inner loop is a
    plain MXU matmul plus a column bias — exactly a flash-attention score
    block. The row term ``|x_i|^2/2`` is pulled *out* of the LSE, which
    keeps the streaming kernels free of per-row broadcasts.
  - All reductions keep float32 accumulators with running-max
    renormalization.
"""

import functools


import jax
import jax.numpy as jnp
from jax import lax

from .costs import COORD_PRECISION, SQDIST_FLOOR, cost_routines, squared_distances


def _acc_dtype(dt):
    """MXU accumulation dtype: at least float32, but never downcast float64."""
    return jnp.result_type(dt, jnp.float32)

__all__ = [
    "softmin_dense",
    "softmin_points",
    "sinkhorn_step_points",
    "softmin_extrapolation",
    "softmin_extrapolation_sym",
    "gibbs_apply",
    "lse_points",
    "lse_points_custom",
]


# ==============================================================================
#  Dense softmin on explicit cost matrices ("tensorized")
# ==============================================================================


def softmin_dense(eps, C, h):
    """Softmin on a dense cost matrix.

    Args:
        eps: temperature (positive scalar, possibly traced).
        C: ``(..., N, M)`` cost matrix.
        h: ``(..., M)`` dual vector (usually ``b_log + g / eps``).

    Returns:
        ``(..., N)`` dual potential ``f``.
    """
    return -eps * jax.nn.logsumexp(h[..., None, :] - C / eps, axis=-1)


# ==============================================================================
#  Streaming log-sum-exp over implicit point-cloud costs
# ==============================================================================
#
# The raw primitive is
#     lse_points(x, y, h, eps, p)[i] = log sum_j exp(h_j - C(x_i,y_j)/eps)
# from which softmin_points = -eps * lse_points.


def _lse_dense(x, y, h, eps, p):
    C = cost_routines[p](x, y)
    return jax.nn.logsumexp(h[None, :] - C / eps, axis=-1)


def _chunk_score(x, y_blk, h_blk, eps, p):
    """Scores ``h_j - C_ij / eps`` for one block of y. Shapes (N, BM)."""
    acc = _acc_dtype(x.dtype)
    if p == 2:
        # h'_j - |x_i|^2/(2 eps) + <x_i, y_j>/eps with h' folded by caller:
        sq_y = 0.5 * (y_blk * y_blk).sum(-1)
        dots = jnp.dot(
            x, y_blk.T, preferred_element_type=acc, precision=COORD_PRECISION
        )
        return (h_blk - sq_y / eps)[None, :] + (
            dots - 0.5 * (x * x).sum(-1)[:, None]
        ) / eps
    else:
        sq = (
            (x * x).sum(-1)[:, None]
            - 2
            * jnp.dot(
                x, y_blk.T, preferred_element_type=acc, precision=COORD_PRECISION
            )
            + (y_blk * y_blk).sum(-1)[None, :]
        )
        d = jnp.sqrt(jnp.clip(sq, min=SQDIST_FLOOR))
        return h_blk[None, :] - d / eps


def _lse_scan(x, y, h, eps, p, block_m=2048):
    """Chunked online LSE: O(N * BM) live memory, any backend."""
    N = x.shape[0]
    M = y.shape[0]
    bm = min(block_m, M)
    n_blocks = -(-M // bm)
    pad = n_blocks * bm - M
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0)))
        h = jnp.pad(h, (0, pad), constant_values=-1e30)
    y_blocks = y.reshape(n_blocks, bm, -1)
    h_blocks = h.reshape(n_blocks, bm)

    def body(carry, blk):
        m, s = carry
        y_blk, h_blk = blk
        scores = _chunk_score(x, y_blk, h_blk, eps, p)
        blk_max = scores.max(axis=-1)
        new_m = jnp.maximum(m, blk_max)
        s = s * jnp.exp(m - new_m) + jnp.exp(scores - new_m[:, None]).sum(-1)
        return (new_m, s), None

    m0 = jnp.full((N,), -1e30, dtype=x.dtype)
    s0 = jnp.zeros((N,), dtype=x.dtype)
    (m, s), _ = lax.scan(body, (m0, s0), (y_blocks, h_blocks))
    return m + jnp.log(s)


def _resolve_impl(impl, n, m):
    if impl != "auto":
        return impl
    if jax.default_backend() == "tpu":
        # Dense stays competitive while the cost matrix fits comfortably:
        return "dense" if n * m <= 4096 * 4096 else "pallas"
    return "dense" if n * m <= 4096 * 4096 else "scan"


def _lse_points_raw(x, y, h, eps, p, impl):
    impl = _resolve_impl(impl, x.shape[0], y.shape[0])
    if impl == "dense":
        return _lse_dense(x, y, h, eps, p)
    if impl == "scan":
        return _lse_scan(x, y, h, eps, p)
    if impl == "pallas":
        from .pallas_kernels import lse_pallas

        return lse_pallas(x, y, h, eps, p)
    raise ValueError(f"Unknown softmin implementation: {impl!r}")


# ------------------------------------------------------------------------------
#  Fused symmetric Sinkhorn step
# ------------------------------------------------------------------------------


def sinkhorn_step_points(eps, x, y, a_log, b_log, f, g, p=2, impl="auto",
                         sym=False, exact=True):
    r"""Both raw softmin values of one Jacobi-style Sinkhorn iteration:

    ``S_xy[i] = -eps*LSE_j(b_log_j + (g_j - C_ij)/eps)`` and
    ``S_yx[j] = -eps*LSE_i(a_log_i + (f_i - C_ij)/eps)``.

    On TPU this fuses into a *single pass* over the pair interactions
    (:func:`geomloss_tpu.ops.pallas_kernels.sinkhorn_step_pallas`) — half
    the work of two independent softmin sweeps, with no running-max pass.
    Elsewhere it falls back to two streaming LSEs (identical math). With
    ``sym=True`` only the row direction is computed (``S_yx is None``).
    ``exact=False`` selects plain-bf16 MXU scores for warm annealing
    iterations on the Pallas path (other impls are always exact).
    """
    impl = _resolve_impl(impl, x.shape[0], y.shape[0])
    if impl == "pallas":
        from .pallas_kernels import (
            sinkhorn_step_pallas,
            sinkhorn_step_sym_pallas,
            sym_triangle_fits,
        )

        if sym and x is y and f is g and sym_triangle_fits(x.shape[0]):
            # Upper-triangle walk: half the pair count (W is symmetric).
            return (
                sinkhorn_step_sym_pallas(x, f, a_log, eps, p=p, exact=exact),
                None,
            )
        return sinkhorn_step_pallas(
            x, y, f, g, a_log, b_log, eps, p=p, sym=sym, exact=exact
        )
    lse = _lse_dense if impl == "dense" else _lse_scan
    S_xy = -eps * lse(x, y, b_log + g / eps, eps, p)
    if sym:
        return S_xy, None
    S_yx = -eps * lse(y, x, a_log + f / eps, eps, p)
    return S_xy, S_yx


# ------------------------------------------------------------------------------
#  Fused differentiable last extrapolation
# ------------------------------------------------------------------------------
#
# The loop's final softmin calls are the only ones autograd sees (envelope
# theorem). Fusing the two cross directions into one absorbed pass — and
# expressing each VJP as a *normalized* (absorbed) Gibbs sweep — replaces
# four two-pass LSE sweeps + four backward sweeps with one fused forward
# pass and two single-pass backward sweeps per direction pair.
#
# Gradient semantics (reference ``_legacy/sinkhorn_samples.py:179-185``,
# ``392-393``): costs are built with a detached second argument, so
# ``S_xy`` only differentiates w.r.t. ``x`` and ``S_yx`` only w.r.t.
# ``y``; the dual vector ``h`` and the absorption shifts are detached.


def _extrap_dx(x, y, f, g, loga, logb, eps, S, u, p, impl):
    """d<u, S_xy>/dx for the absorbed softmin (row direction)."""
    # Row-normalized absorbed weights: phi folds -log(rowsum):
    logr = (f - S) / eps + loga
    phi = f / eps + loga - logr
    psi = g / eps + logb
    if p == 2:
        # Normalized weights sum to exactly 1: the ones channel is
        # analytic, dx = u * (x - sum_j w~_ij y_j) — one fewer channel
        # pass per apply (p=1 divides by the distance, not normalized).
        R = gibbs_apply(x, y, phi, psi, y, eps, p, kind="gibbs", impl=impl)
        return u[:, None] * (x - R)
    ones = jnp.ones((y.shape[0], 1), dtype=y.dtype)
    V = jnp.concatenate([ones, y], axis=-1)
    R = gibbs_apply(x, y, phi, psi, V, eps, p, kind="gibbs_grad", impl=impl)
    return u[:, None] * (x * R[:, :1] - R[:, 1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def softmin_extrapolation(x, y, f, g, loga, logb, eps, p, impl):
    r"""Raw softmin pair of the differentiable last extrapolation.

    Returns ``(S_xy, S_yx)`` (see :func:`sinkhorn_step_points`) with
    gradients flowing to ``x`` through ``S_xy`` and to ``y`` through
    ``S_yx`` only — the reference's detached-cost convention. ``f``,
    ``g``, ``loga``, ``logb`` and ``eps`` are treated as constants.
    """
    return sinkhorn_step_points(eps, x, y, loga, logb, f, g, p=p, impl=impl)


def _softmin_extrapolation_fwd(x, y, f, g, loga, logb, eps, p, impl):
    S_xy, S_yx = sinkhorn_step_points(eps, x, y, loga, logb, f, g, p=p, impl=impl)
    return (S_xy, S_yx), (x, y, f, g, loga, logb, eps, S_xy, S_yx)


def _softmin_extrapolation_bwd(p, impl, res, us):
    x, y, f, g, loga, logb, eps, S_xy, S_yx = res
    u_f, u_g = us
    dx = _extrap_dx(x, y, f, g, loga, logb, eps, S_xy, u_f, p, impl)
    dy = _extrap_dx(y, x, g, f, logb, loga, eps, S_yx, u_g, p, impl)
    z = jnp.zeros_like
    return (
        dx.astype(x.dtype),
        dy.astype(y.dtype),
        z(f),
        z(g),
        z(loga),
        z(logb),
        jnp.zeros_like(jnp.asarray(eps)),
    )


softmin_extrapolation.defvjp(_softmin_extrapolation_fwd, _softmin_extrapolation_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def softmin_extrapolation_sym(x, f, loga, eps, p, impl):
    """Symmetric-problem (debias) variant of :func:`softmin_extrapolation`:
    one direction, second cloud detached."""
    return sinkhorn_step_points(eps, x, x, loga, loga, f, f, p=p, impl=impl, sym=True)[0]


def _softmin_extrapolation_sym_fwd(x, f, loga, eps, p, impl):
    S = sinkhorn_step_points(eps, x, x, loga, loga, f, f, p=p, impl=impl, sym=True)[0]
    return S, (x, f, loga, eps, S)


def _softmin_extrapolation_sym_bwd(p, impl, res, u):
    x, f, loga, eps, S = res
    dx = _extrap_dx(x, x, f, f, loga, loga, eps, S, u, p, impl)
    return (
        dx.astype(x.dtype),
        jnp.zeros_like(f),
        jnp.zeros_like(loga),
        jnp.zeros_like(jnp.asarray(eps)),
    )


softmin_extrapolation_sym.defvjp(
    _softmin_extrapolation_sym_fwd, _softmin_extrapolation_sym_bwd
)


# ------------------------------------------------------------------------------
#  Gibbs kernel application (shared by VJPs, MMD losses and lazy plans)
# ------------------------------------------------------------------------------


#: Squared-distance cutoff below which distance-gradient weights are zeroed.
#: The expansion-form ``|x|^2 - 2<x,y> + |y|^2`` carries ~1e-7 of f32 noise,
#: so for pairs closer than ~1e-3 the computed direction ``(x-y)/d`` is pure
#: noise amplified by ``1/d``. The reference's per-pair formula yields exact
#: zeros on the diagonal (``sqrt(clamp_min(., 1e-8))`` has zero gradient in
#: the clamped region, ``_legacy/utils.py:61``); zeroing is the faithful —
#: and stable — streaming equivalent.
GRAD_SQDIST_CUT = 1e-6


def _gibbs_weight_dense(x, y, phi, psi, eps, p, kind):
    """Dense ``(N, M)`` weight matrix for one of the supported kinds."""
    if kind == "energy":
        return -cost_routines[1](x, y)
    if kind == "inv_dist":
        sq = squared_distances(x, y)
        d = jnp.sqrt(jnp.clip(sq, min=SQDIST_FLOOR))
        return jnp.where(sq > GRAD_SQDIST_CUT, 1.0 / d, 0.0)
    if kind == "gibbs_grad" and p == 1:
        sq = squared_distances(x, y)
        d = jnp.sqrt(jnp.clip(sq, min=SQDIST_FLOOR))
        w = jnp.exp(phi[:, None] + psi[None, :] - d / eps)
        return jnp.where(sq > GRAD_SQDIST_CUT, w / d, 0.0)
    C = cost_routines[p](x, y)
    return jnp.exp(phi[:, None] + psi[None, :] - C / eps)


def _gibbs_apply_dense(x, y, phi, psi, V, eps, p, kind):
    w = _gibbs_weight_dense(x, y, phi, psi, eps, p, kind)
    return jnp.dot(
        w, V, preferred_element_type=_acc_dtype(V.dtype), precision=COORD_PRECISION
    ).astype(V.dtype)


def _gibbs_apply_scan(x, y, phi, psi, V, eps, p, kind, block_m=2048):
    M = y.shape[0]
    bm = min(block_m, M)
    n_blocks = -(-M // bm)
    pad = n_blocks * bm - M
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0)))
        psi = jnp.pad(psi, (0, pad), constant_values=-1e30)
        V = jnp.pad(V, ((0, pad), (0, 0)))
    y_b = y.reshape(n_blocks, bm, -1)
    psi_b = psi.reshape(n_blocks, bm)
    V_b = V.reshape(n_blocks, bm, -1)

    acc_dt = _acc_dtype(V.dtype)

    def body(acc, blk):
        y_blk, psi_blk, V_blk = blk
        w = _gibbs_weight_dense(x, y_blk, phi, psi_blk, eps, p, kind)
        return (
            acc
            + jnp.dot(
                w, V_blk, preferred_element_type=acc_dt, precision=COORD_PRECISION
            ),
            None,
        )

    acc0 = jnp.zeros((x.shape[0], V.shape[-1]), dtype=acc_dt)
    acc, _ = lax.scan(body, acc0, (y_b, psi_b, V_b))
    return acc.astype(V.dtype)


def gibbs_apply(x, y, phi, psi, V, eps, p, kind="gibbs", impl="auto"):
    r"""Streaming kernel-weighted reduction
    ``O_i = sum_j w_ij V_j`` with

    * ``kind='gibbs'``:      ``w_ij = exp(phi_i + psi_j - C_p(x_i,y_j)/eps)``
    * ``kind='gibbs_grad'``: same, divided by ``|x_i - y_j|`` when ``p == 1``
      (the extra factor in the gradient of the Euclidean cost),
    * ``kind='energy'``:     ``w_ij = -|x_i - y_j|`` (energy-distance kernel),
    * ``kind='inv_dist'``:   ``w_ij = 1 / |x_i - y_j|`` (energy gradient).

    This single primitive implements: softmin VJPs, MMD kernel matvecs
    (reference ``kernel_loss`` matvecs, ``_legacy/kernel_samples.py:128-137``)
    and lazy transport-plan applications (``ot/_ot_result.py:388-406``).

    Args:
        x: ``(N, D)``; y: ``(M, D)``; phi: ``(N,)``; psi: ``(M,)``;
        V: ``(M, C)`` channel matrix; eps: scalar; p: 1 or 2 (static);
        kind, impl: static strings.

    Returns:
        ``(N, C)`` array.
    """
    impl = _resolve_impl(impl, x.shape[0], y.shape[0])
    if impl == "dense":
        return _gibbs_apply_dense(x, y, phi, psi, V, eps, p, kind)
    if impl == "scan":
        return _gibbs_apply_scan(x, y, phi, psi, V, eps, p, kind)
    if impl == "pallas":
        from .pallas_kernels import gibbs_apply_pallas

        return gibbs_apply_pallas(x, y, phi, psi, V, eps, p, kind)
    raise ValueError(f"Unknown gibbs_apply implementation: {impl!r}")


# ==============================================================================
#  Differentiable streaming softmin on point clouds
# ==============================================================================


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lse_points(x, y, h, eps, p, impl):
    r"""``lse_points(x,y,h,eps)[i] = log sum_j exp(h_j - C_p(x_i,y_j)/eps)``.

    Differentiable w.r.t. ``x``, ``y`` and ``h`` through an analytic,
    streaming VJP. ``eps`` is treated as non-differentiable (it is a plain
    Python float in the reference library).
    """
    return _lse_points_raw(x, y, h, eps, p, impl)


def _lse_points_fwd(x, y, h, eps, p, impl):
    out = _lse_points_raw(x, y, h, eps, p, impl)
    return out, (x, y, h, eps, out)


def _lse_points_bwd(p, impl, res, u):
    # out_i = log sum_j exp(h_j - C_ij/eps); w_ij = exp(h_j - C_ij/eps - out_i)
    # d/dh_j   = sum_i u_i w_ij
    # d/dx_i   = -(u_i/eps) sum_j w_ij dC_ij/dx_i
    # d/dy_j   = -(1/eps)  sum_i u_i w_ij dC_ij/dy_j
    x, y, h, eps, out = res
    D = x.shape[-1]
    phi = -out  # row bias: -lse_i
    psi = h  # col bias

    kind = "gibbs" if p == 2 else "gibbs_grad"

    # Row-side reduction: R_i = sum_j w'_ij [1, y_j]  -> (N, 1 + D)
    ones_y = jnp.ones((y.shape[0], 1), dtype=y.dtype)
    Vy = jnp.concatenate([ones_y, y], axis=-1)
    R = gibbs_apply(x, y, phi, psi, Vy, eps, p, kind=kind, impl=impl)
    # dC/dx_i summed with weights: p=2 -> x_i * sum_j w - sum_j w y_j
    #                              p=1 -> x_i * sum_j w/d - sum_j (w/d) y_j
    dx = -(u / eps)[:, None] * (x * R[:, :1] - R[:, 1:])

    # Column-side reduction: swap roles of x and y, fold u into channels.
    ones_x = jnp.ones((x.shape[0], 1), dtype=x.dtype)
    Vx = u[:, None] * jnp.concatenate([ones_x, x], axis=-1)
    Tq = gibbs_apply(y, x, psi, phi, Vx, eps, p, kind=kind, impl=impl)
    dy = -(1.0 / eps) * (y * Tq[:, :1] - Tq[:, 1:])

    # dh needs plain (non-grad) weights even for p = 1:
    if p == 1:
        t = gibbs_apply(y, x, psi, phi, u[:, None], eps, p, kind="gibbs", impl=impl)
        dh = t[:, 0]
    else:
        dh = Tq[:, 0]

    d_eps = jnp.zeros_like(jnp.asarray(eps))
    return (dx.astype(x.dtype), dy.astype(y.dtype), dh.astype(h.dtype), d_eps)


lse_points.defvjp(_lse_points_fwd, _lse_points_bwd)


def lse_points_custom(x, y, h, eps, cost, block_m=2048):
    r"""Streaming LSE with a user-supplied cost callable.

    The reference's online backend only accepts KeOps *formula strings*
    (``_legacy/sinkhorn_samples.py:316-334``); here any traced JAX
    callable ``cost((1,N,D), (1,BM,D)) -> (1,N,BM)`` works — evaluated
    chunk by chunk inside a rematerialized ``lax.scan``, so both the
    forward pass and plain autodiff run in O(N * BM) memory.
    """
    N, M = x.shape[0], y.shape[0]
    bm = min(block_m, M)
    n_blocks = -(-M // bm)
    pad = n_blocks * bm - M
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0)), mode="edge")
        h = jnp.pad(h, (0, pad), constant_values=-1e30)
    y_blocks = y.reshape(n_blocks, bm, -1)
    h_blocks = h.reshape(n_blocks, bm)

    @jax.checkpoint
    def body(carry, blk):
        m, s = carry
        y_blk, h_blk = blk
        C = cost(x[None], y_blk[None])[0]  # (N, BM)
        scores = h_blk[None, :] - C / eps
        blk_max = scores.max(axis=-1)
        new_m = jnp.maximum(m, blk_max)
        s = s * jnp.exp(m - new_m) + jnp.exp(scores - new_m[:, None]).sum(-1)
        return (new_m, s), None

    m0 = jnp.full((N,), -1e30, dtype=x.dtype)
    s0 = jnp.zeros((N,), dtype=x.dtype)
    (m, s), _ = lax.scan(body, (m0, s0), (y_blocks, h_blocks))
    return m + jnp.log(s)


def softmin_points(eps, C_xy, h, p=2, impl="auto", cost=None):
    """Online softmin on point clouds — the "online"/"multiscale" softmin.

    Args:
        eps: temperature.
        C_xy: pair ``(x, y)`` of ``(N, D)`` / ``(M, D)`` (or batched
            ``(B, N, D)`` / ``(B, M, D)``) point clouds. The caller decides
            which of the two carries gradients (the reference detaches the
            second argument, ``_legacy/sinkhorn_samples.py:392-393``).
        h: ``(M,)`` or ``(B, M)`` dual vector.
        p: 1 or 2 (static).
        impl: 'auto' | 'dense' | 'scan' | 'pallas' (static).
        cost: optional callable ``(B,N,D),(B,M,D) -> (B,N,M)`` replacing
            the built-in ``|x-y|^p / p`` costs (streamed chunk by chunk;
            gradients via rematerialized autodiff).

    Returns:
        ``(N,)`` or ``(B, N)`` potential.
    """
    x, y = C_xy
    eps = jnp.asarray(eps, dtype=x.dtype)
    if cost is not None:
        if x.ndim == 3:
            fn = jax.vmap(lambda xb, yb, hb: lse_points_custom(xb, yb, hb, eps, cost))
            return -eps * fn(x, y, h)
        return -eps * lse_points_custom(x, y, h, eps, cost)
    if x.ndim == 3:
        fn = jax.vmap(lambda xb, yb, hb: lse_points(xb, yb, hb, eps, p, impl))
        return -eps * fn(x, y, h)
    return -eps * lse_points(x, y, h, eps, p, impl)


# ==============================================================================
#  Differentiable streaming kernel matvec (MMD losses)
# ==============================================================================


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gibbs_matvec(x, y, v, eps, p, kind, impl):
    r"""``O_i = sum_j k(x_i, y_j) v_j`` with an analytic streaming VJP.

    ``kind='gibbs'``: :math:`k = \exp(-C_p/\varepsilon)` (gaussian for
    p=2, eps=blur^2; laplacian for p=1, eps=blur);
    ``kind='energy'``: :math:`k = -|x - y|`.

    This is the differentiable front door to :func:`gibbs_apply` — needed
    because the Pallas implementation has no autodiff rule of its own.
    """
    z_n = jnp.zeros(x.shape[0], x.dtype)
    z_m = jnp.zeros(y.shape[0], y.dtype)
    return gibbs_apply(x, y, z_n, z_m, v[:, None], eps, p, kind=kind, impl=impl)[:, 0]


def _gibbs_matvec_fwd(x, y, v, eps, p, kind, impl):
    out = gibbs_matvec(x, y, v, eps, p, kind, impl)
    return out, (x, y, v, eps)


def _gibbs_matvec_bwd(p, kind, impl, res, u):
    x, y, v, eps = res
    z_n = jnp.zeros(x.shape[0], x.dtype)
    z_m = jnp.zeros(y.shape[0], y.dtype)
    ones_y = jnp.ones((y.shape[0], 1), y.dtype)
    ones_x = jnp.ones((x.shape[0], 1), x.dtype)
    Vy = v[:, None] * jnp.concatenate([ones_y, y], -1)
    Ux = u[:, None] * jnp.concatenate([ones_x, x], -1)

    if kind == "gibbs":
        wk = "gibbs" if p == 2 else "gibbs_grad"
        R = gibbs_apply(x, y, z_n, z_m, Vy, eps, p, kind=wk, impl=impl)
        dx = -(u / eps)[:, None] * (x * R[:, :1] - R[:, 1:])
        T = gibbs_apply(y, x, z_m, z_n, Ux, eps, p, kind=wk, impl=impl)
        dy = -(v / eps)[:, None] * (y * T[:, :1] - T[:, 1:])
        if p == 1:
            dv = gibbs_apply(
                y, x, z_m, z_n, u[:, None], eps, p, kind="gibbs", impl=impl
            )[:, 0]
        else:
            dv = T[:, 0]
    elif kind == "energy":
        # O = -sum_j d_ij v_j: dO/dx_i = -sum_j v_j (x_i - y_j)/d_ij.
        R = gibbs_apply(x, y, z_n, z_m, Vy, eps, 1, kind="inv_dist", impl=impl)
        dx = -u[:, None] * (x * R[:, :1] - R[:, 1:])
        T = gibbs_apply(y, x, z_m, z_n, Ux, eps, 1, kind="inv_dist", impl=impl)
        dy = -v[:, None] * (y * T[:, :1] - T[:, 1:])
        dv = gibbs_apply(
            y, x, z_m, z_n, u[:, None], eps, 1, kind="energy", impl=impl
        )[:, 0]
    else:
        raise NotImplementedError(kind)

    return (
        dx.astype(x.dtype),
        dy.astype(y.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(jnp.asarray(eps)),
    )


gibbs_matvec.defvjp(_gibbs_matvec_fwd, _gibbs_matvec_bwd)
