r"""``ot.solve`` / ``ot.solve_batch`` — OT with an explicit cost matrix.

Re-implementation of
``/root/reference/src/geomloss/ot/_implementations/matrix.py``: dense
batched softmin (with the :math:`\varepsilon \in \{0, \infty\}` limit
cases used by the initialization), validation, annealing driven by
``max_iter``, the biased Sinkhorn loop (no debiasing for a fixed cost
matrix) and the ``OTResultMatrix`` lazy result object.
"""

import math

import jax.numpy as jnp

from ..solvers.annealing import annealing_parameters
from ..solvers.sinkhorn_ot import sinkhorn_loop
from ..utils.cache import lazy_properties
from ..utils.typing import CostMatrices
from ..utils.validation import (
    ArrayProperties,
    check_library_dtype_device,
    check_marginal,
    check_marginal_masses,
    check_regularization,
    convert_inputs,
)
from .result import LinearOperator, OTResult

__all__ = ["softmin_dense", "solve", "solve_batch", "OTResultMatrix", "barycenter"]


def softmin_dense(eps, log_weights, costs, potentials):
    r"""Batched dense softmin with explicit eps = 0 / +infinity limit cases.

    ``f_x[i] = -eps * log sum_j exp(log_b[j] + (g[j] - C[i,j]) / eps)``

    Reference: ``matrix.py:37-97``. Shapes: log_weights ``(B, M)``, costs
    ``(B, N, M)``, potentials ``(B, M)`` -> ``(B, N)``.
    ``eps`` may be traced only when strictly positive and finite.
    """
    log_b_y, C_xy, g_y = log_weights, costs, potentials
    assert len(C_xy.shape) == 3, "C_xy should be a (B,N,M) Tensor."
    B, N, M = C_xy.shape
    assert g_y.shape == (B, M)
    assert log_b_y.shape == (B, M)

    if isinstance(eps, float) and eps == float("inf"):
        # Weighted average of (C - g): the eps -> infinity limit.
        b_y = jnp.exp(log_b_y)  # (B, M)
        sum_b = b_y.sum(axis=1, keepdims=True)  # (B, 1)
        f_i = ((C_xy - g_y[:, None, :]) * b_y[:, None, :]).sum(axis=2)  # (B, N)
        return f_i / sum_b
    elif isinstance(eps, float) and eps == 0:
        return jnp.min(C_xy - g_y[:, None, :], axis=2)  # hard C-transform
    else:
        scores_xy = (log_b_y + g_y / eps)[:, None, :] - C_xy / eps
        import jax

        return -eps * jax.nn.logsumexp(scores_xy, axis=2)


def stable_log(a):
    """log with values clamped to -100000 for zero weights
    (reference ``_backends/torch.py:21-25``)."""
    return jnp.where(a > 0, jnp.log(jnp.maximum(a, 1e-30)), -100000.0)  # 1e-30 floor: TPU flushes subnormals, 0*inf grad = NaN


@lazy_properties
class OTResultMatrix(OTResult):
    """Result of an OT problem computed from an explicit cost matrix.

    Reference: ``matrix.py:110-339``.
    """

    def __init__(
        self,
        *,
        a,
        b,
        C,
        potentials,
        array_properties,
        reg,
        reg_type,
        unbalanced,
        unbalanced_type,
    ):
        super().__init__(
            a=a,
            b=b,
            C=C,
            potentials=potentials,
            array_properties=array_properties,
            batchsize=array_properties.B,
            reg=reg,
            reg_type=reg_type,
            unbalanced=unbalanced,
            unbalanced_type=unbalanced_type,
            debias=False,
        )
        ap = self._array_properties
        self._shapes = {
            "a": (ap.B, ap.N),
            "b": (ap.B, ap.M),
            "C": (ap.B, ap.N, ap.M),
            "B": (ap.B,),
        }

    _cached_properties = (
        "potential_a",
        "potential_b",
        "density",
        "lazy_density",
        "density_operator",
        "plan",
        "lazy_plan",
        "plan_operator",
        "value",
        "value_linear",
        "marginal_a",
        "marginal_b",
        "citation",
    )

    def _squeeze_batchdim(self):
        """Removes the batch dimension, assuming that it is a dummy one."""
        ap = self._array_properties
        assert ap.B == 1
        assert self._batchsize == 1
        self._batchsize = 0
        self._shapes = {
            "a": (ap.N,),
            "b": (ap.M,),
            "C": (ap.N, ap.M),
            "B": (),
        }

    def _density(self):
        r"""Density $P_{ij} = \exp((f_i + g_j - C_{ij})/\varepsilon)$ of the
        transport plan w.r.t. $\alpha \otimes \beta$ (reference ``matrix.py:189-223``)."""
        f = self._potentials.f_ba  # (B, N)
        g = self._potentials.g_ab  # (B, M)
        C = self._C  # (B, N, M)
        eps = self._reg
        assert eps > 0
        D_ij = jnp.exp((f[:, :, None] + g[:, None, :] - C) / eps)
        return self.cast(D_ij, "C")

    def _density_operator(self):
        r"""Linear operator associated to :attr:`density`."""
        return LinearOperator.from_dense(
            self.density,
            input_shape=self._shapes["b"],
            output_shape=self._shapes["a"],
        )

    def _plan(self):
        r"""Optimal transport plan $\pi_{ij} = \alpha_i \beta_j P_{ij}$."""
        a, b = self._a, self._b
        dens = self.density
        ap = self._array_properties
        B, N, M = ap.B, ap.N, ap.M
        if self._batchsize == 0:
            dens = dens.reshape(B, N, M)
        if self._reg_type == "KL":
            plan = a[:, :, None] * b[:, None, :] * dens
        else:
            raise NotImplementedError(
                "Currently, we only support the computation "
                "of transport plans when `reg_type = 'KL'`."
            )
        return self.cast(plan, "C")


@convert_inputs("C", "a", "b")
def solve(
    C,
    *,
    reg,
    a=None,
    b=None,
    unbalanced=None,
    unbalanced_type="KL",
    method="auto",
    max_iter=None,
    tol=None,
) -> OTResultMatrix:
    r"""Solves an entropy-regularized OT problem with an explicit cost matrix.

    POT-compatible front-end (reference ``matrix.py:347-516``); see
    :func:`solve_batch` for the batched version. Returns an
    :class:`OTResultMatrix` with lazily-computed ``plan``, ``value``,
    ``potential_a/b`` and ``marginal_a/b`` attributes.

    Example:
        >>> import numpy as np
        >>> from geomloss_tpu import ot
        >>> sol = ot.solve(C=[[0., 1., 4.], [2., 1., 0.]],
        ...                a=[2., 2.], b=[1., 1., 2.], reg=0.001, max_iter=100)
        >>> print(np.asarray(sol.plan).round(3))
        [[1. 1. 0.]
         [0. 0. 2.]]
        >>> print(round(float(sol.value_linear), 3))
        1.0
        >>> print(np.asarray(sol.marginal_a).round(3))
        [2. 2.]
    """
    if len(C.shape) != 2:
        raise ValueError(
            "The 'cost' matrix should be an array with 2 dimensions. "
            f"Instead, ot.solve received an array of shape {C.shape}."
        )
    N, M = C.shape
    a = check_marginal(a, ones_like=C[:, 0], marginal_size=N, name="a")
    b = check_marginal(b, ones_like=C[0, :], marginal_size=M, name="b")

    result = solve_batch(
        C[None, :, :],
        a=a[None, :],
        b=b[None, :],
        reg=reg,
        unbalanced=unbalanced,
        unbalanced_type=unbalanced_type,
        method=method,
        max_iter=max_iter,
        tol=tol,
    )
    result._squeeze_batchdim()
    return result


@convert_inputs("C", "a", "b")
def solve_batch(
    C,
    *,
    reg,
    a=None,
    b=None,
    unbalanced=None,
    unbalanced_type="KL",
    method="auto",
    max_iter=None,
    tol=None,
) -> OTResultMatrix:
    r"""Batched version of :func:`solve`: B problems in parallel
    (reference ``matrix.py:519-696``)."""
    check_regularization(
        reg=reg,
        unbalanced=unbalanced,
        unbalanced_type=unbalanced_type,
        method=method,
        tol=tol,
        max_iter=max_iter,
    )

    if len(C.shape) != 3:
        raise ValueError(
            "The 'cost' matrix should be an array with 3 dimensions (batch, N, M). "
            f"Instead, ot.solve received an array of shape {C.shape}."
        )
    B, N, M = C.shape

    a = check_marginal(a, ones_like=C[:, :, 0], marginal_size=N, name="a")
    b = check_marginal(b, ones_like=C[:, 0, :], marginal_size=M, name="b")

    if unbalanced is None:
        check_marginal_masses(a.sum(axis=1), b.sum(axis=1))

    library, dtype, device = check_library_dtype_device(a, b, C)
    array_properties = ArrayProperties(
        B=B, N=N, M=M, dtype=dtype, device=device, library=library
    )

    descent = annealing_parameters(
        maxmin_cost=float(jnp.max(C) - jnp.min(C)),
        eps=reg,
        rho=unbalanced,
        n_iter=max_iter,
    )

    # N.B.: With a fixed cost matrix, there is no debiasing.
    potentials = sinkhorn_loop(
        softmin=softmin_dense,
        log_a_list=[stable_log(a)],
        log_b_list=[stable_log(b)],
        C_list=[CostMatrices(xy=C, yx=jnp.swapaxes(C, 1, 2))],
        descent=descent,
        debias=False,
        last_extrapolation=True,
    )

    return OTResultMatrix(
        a=a,
        b=b,
        C=C,
        potentials=potentials,
        array_properties=array_properties,
        reg=reg,
        reg_type="KL",
        unbalanced=unbalanced,
        unbalanced_type=unbalanced_type,
    )


class BarycenterResult:
    """Result of a Wasserstein barycenter problem.

    Follows the shape conventions the reference documents for its (stub)
    ``ot.barycenter`` / ``ot.barycenter_sample`` (``matrix.py:704-717``,
    ``sample.py:640-652``): ``masses`` are the barycenter weights on its
    ``M``-point support, ``samples`` the support coordinates when the
    solver chooses them (free-support problems; ``None`` otherwise).
    """

    def __init__(self, *, masses, samples=None, potentials=None, reg=None):
        self.masses = masses
        self.samples = samples
        self.potentials = potentials
        self.reg = reg

    def __repr__(self):
        shape = tuple(self.masses.shape)
        tail = "" if self.samples is None else f", samples{tuple(self.samples.shape)}"
        return f"BarycenterResult(masses{shape}{tail})"


def _softmin_bk(eps, C, h):
    """Softmin over the last axis of ``C`` with a (B, K) problem batch:
    h ``(B, K, X)``, C ``(B, K, Y, X)`` -> ``(B, K, Y)``."""
    import jax

    return -eps * jax.nn.logsumexp(h[:, :, None, :] - C / eps, axis=-1)


def _barycenter_C(cost, Ct, C_bb):
    """Cost descriptor wiring explicit matrices into the *shared*
    barycenter iteration (``solvers.barycenters.barycenter_iteration``):
    ``xy`` maps data supports to the barycenter (so it is the transposed
    stack), ``xx`` is the barycenter self-cost used by the debiasing
    update (``None`` turns debiasing off — the shared iteration then
    gauge-pins the mass to the simplex instead).

    Shapes: f_k ``(B, K, M)`` (barycenter support), g_k / log_a
    ``(B, K, N)`` (data supports), log_d ``(B, 1, M)``, w_k ``(B, K)``;
    cost ``(B, K, N, M)``, Ct its transpose, C_bb ``(B, M, M)``.
    """
    from ..utils.typing import CostMatrices

    xx = None if C_bb is None else C_bb[:, None, :, :]
    return CostMatrices(xy=Ct, yx=cost, xx=xx)


def barycenter(
    cost,
    a=None,
    weights=None,
    *,
    reg,
    max_iter,
    cost_bar=None,
    backward_iterations=5,
    maxmin_cost=None,
) -> BarycenterResult:
    r"""Entropic Wasserstein barycenter on a fixed support, from explicit
    cost matrices.

    Solves ``argmin_bar sum_k weights[k] * OT_reg(a_k, bar)`` over the
    masses of a fixed ``M``-point barycenter support, by symmetric
    log-domain iterative Bregman projections with epsilon-annealing.
    **Working implementation of the reference's non-functional stub**
    (``/root/reference/src/geomloss/ot/_implementations/matrix.py:709-717``,
    shape conventions from its comments).

    Args:
        cost: ``(N, M)``, ``(K, N, M)`` or ``(B, K, N, M)`` cost matrices
            from each input measure's ``N``-point support to the shared
            ``M``-point barycenter support.
        a: input masses, ``(N,)``, ``(K, N)`` or ``(B, K, N)``
            (default: uniform ``1/N``).
        weights: barycentric weights, ``(K,)`` or ``(B, K)``
            (default: uniform ``1/K``).
        reg: entropic regularization strength (the final temperature of
            the annealing schedule).
        max_iter: number of Sinkhorn iterations (static).
        cost_bar: optional ``(M, M)`` / ``(B, M, M)`` cost on the
            barycenter support itself. When given, the Janati-Cuturi-
            Gramfort debiasing density is tracked, removing the entropic
            blur from the returned masses.
        backward_iterations: trailing iterations re-executed with
            autodiff enabled (the envelope shortcut; everything before is
            detached), so gradients flow to ``cost``, ``a``, ``weights``.
            ``0`` differentiates through the whole annealed descent
            instead, like the reference's ``ImagesBarycenter``
            (``wasserstein_barycenter_images.py:44``).
        maxmin_cost: optional static bound on ``max(cost) - min(cost)``
            (the annealing start temperature). Required under ``jax.jit``,
            where the data-dependent default cannot be evaluated — same
            convention as ``SamplesLoss``'s ``diameter=``.

    Returns:
        :class:`BarycenterResult` with ``masses`` of shape ``(M,)`` or
        ``(B, M)`` (matching the input batch form).

    .. doctest::

        >>> import jax.numpy as jnp
        >>> from geomloss_tpu import ot
        >>> x = jnp.linspace(0, 1, 5)
        >>> C = (x[:, None] - x[None, :]) ** 2  # shared support
        >>> res = ot.barycenter(
        ...     jnp.stack([C, C]),
        ...     a=jnp.stack([jnp.eye(5)[0], jnp.eye(5)[4]]),
        ...     reg=1e-3,
        ...     max_iter=60,
        ...     cost_bar=C,
        ... )
        >>> int(jnp.argmax(res.masses))  # mass concentrates at the middle
        2
    """
    check_regularization(
        reg=reg,
        unbalanced=None,
        unbalanced_type="KL",
        method="auto",
        tol=None,
        max_iter=max_iter,
    )
    cost = jnp.asarray(cost)
    if cost.ndim == 2:
        batched = False
        cost = cost[None, None]
    elif cost.ndim == 3:
        batched = False
        cost = cost[None]
    elif cost.ndim == 4:
        batched = True
    else:
        raise ValueError(
            "The 'cost' argument of ot.barycenter should be an array with "
            "2 (N, M), 3 (K, N, M) or 4 (B, K, N, M) dimensions. "
            f"Received shape {tuple(cost.shape)}."
        )
    B, K, N, M = cost.shape

    if a is None:
        a = jnp.full((B, K, N), 1.0 / N, dtype=cost.dtype)
    else:
        a = jnp.asarray(a, cost.dtype)
        if a.shape == (N,):
            a = jnp.broadcast_to(a, (B, K, N))
        elif a.shape == (K, N):
            a = jnp.broadcast_to(a, (B, K, N))
        elif a.shape != (B, K, N):
            raise ValueError(
                "The masses 'a' should have shape (N,), (K, N) or (B, K, N) "
                f"matching the ({B}, {K}, {N}, {M}) cost matrices; received "
                f"{tuple(a.shape)}."
            )
        # Probability measures (the balanced-Sinkhorn derivation assumes
        # mass 1, like barycenter_sample):
        a = a / a.sum(axis=-1, keepdims=True)
    if weights is None:
        weights = jnp.full((B, K), 1.0 / K, dtype=cost.dtype)
    else:
        weights = jnp.asarray(weights, cost.dtype)
        weights = jnp.broadcast_to(weights.reshape((-1, K)), (B, K))
        weights = weights / weights.sum(axis=1, keepdims=True)

    if cost_bar is not None:
        cost_bar = jnp.asarray(cost_bar, cost.dtype)
        if cost_bar.ndim == 2:
            cost_bar = cost_bar[None]
        if cost_bar.shape[-2:] != (M, M):
            raise ValueError(
                f"cost_bar should be an (M, M) = ({M}, {M}) cost on the "
                f"barycenter support; received shape {tuple(cost_bar.shape)}."
            )
        cost_bar = jnp.broadcast_to(cost_bar, (B, M, M))

    if maxmin_cost is None:
        maxmin_cost = float(jnp.max(cost) - jnp.min(cost))
    descent = annealing_parameters(
        maxmin_cost=maxmin_cost,
        eps=reg,
        n_iter=max_iter,
    )
    eps_list = [float(e) for e in descent.eps_list]

    import jax
    from jax import lax

    sg = lax.stop_gradient
    Ct = jnp.swapaxes(cost, 2, 3)  # (B, K, M, N)
    log_a = stable_log(a)

    # --- Annealed descent ----------------------------------------------------
    # backward_iterations > 0: run detached (envelope shortcut), then a
    # differentiable tail. backward_iterations == 0: like the reference's
    # ImagesBarycenter (`wasserstein_barycenter_images.py:44`), gradients
    # flow through the *whole* descent instead.
    detach = backward_iterations > 0
    wrap = sg if detach else (lambda v: v)
    cost_d, Ct_d, log_a_d, w_d = (
        wrap(cost), wrap(Ct), wrap(log_a), wrap(weights)
    )
    C_bb_d = None if cost_bar is None else wrap(cost_bar)

    from ..solvers.barycenters import barycenter_iteration

    eps0 = eps_list[0]
    f_k = _softmin_bk(eps0, Ct_d, log_a_d)  # (B, K, M)
    log_d = jnp.full((B, 1, M), -math.log(M), cost.dtype)  # uniform reference
    g_k = _softmin_bk(eps0, cost_d, log_d)  # (B, K, N)
    C_desc_d = _barycenter_C(cost_d, Ct_d, C_bb_d)

    def body(state, eps):
        f_k, g_k, log_d = state
        f_k, g_k, log_d, _ = barycenter_iteration(
            softmin=_softmin_bk, f_k=f_k, g_k=g_k, log_d=log_d, eps=eps,
            C=C_desc_d, log_b_k=log_a_d, w_k=w_d,
        )
        return (f_k, g_k, log_d), None

    (f_k, g_k, log_d), _ = lax.scan(
        body, (f_k, g_k, log_d), jnp.asarray(eps_list, cost.dtype)
    )

    # --- Tail at the target temperature --------------------------------------
    eps = eps_list[-1]
    if detach:
        f_k, g_k, log_d = sg(f_k), sg(g_k), sg(log_d)
        log_bar = None
        C_desc = _barycenter_C(cost, Ct, cost_bar)
        for _ in range(backward_iterations):
            f_k, g_k, log_d, log_bar = barycenter_iteration(
                softmin=_softmin_bk, f_k=f_k, g_k=g_k, log_d=log_d, eps=eps,
                C=C_desc, log_b_k=log_a, w_k=weights,
            )
    else:
        # Extract the barycenter from the (fully differentiable) final
        # state with one pseudo-step:
        import jax

        ft_k = _softmin_bk(eps, Ct_d, log_a_d + g_k / eps)
        log_bar = log_d - (ft_k / eps * weights[:, :, None]).sum(
            1, keepdims=True
        )
        if cost_bar is None:
            log_bar = log_bar - jax.nn.logsumexp(
                log_bar, axis=-1, keepdims=True
            )

    masses = jnp.exp(log_bar[:, 0])
    if not batched:
        masses = masses[0]
        f_k, g_k = f_k[0], g_k[0]
    return BarycenterResult(
        masses=masses, potentials=(f_k, g_k), reg=reg
    )
