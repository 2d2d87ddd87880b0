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
    return jnp.where(a > 0, jnp.log(jnp.maximum(a, 1e-45)), -100000.0)


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


def barycenter(cost, a=None, weights=None, **kwargs):
    """Wasserstein barycenter from explicit cost matrices.

    The reference leaves this as a non-functional stub
    (``matrix.py:709-716``); use :func:`geomloss_tpu.ot.barycenter_grid`
    or :class:`geomloss_tpu.ImagesBarycenter` for working barycenters on
    grids."""
    raise NotImplementedError(
        "ot.barycenter on explicit cost matrices is not implemented "
        "(it is a stub in the reference library as well); see "
        "geomloss_tpu.ImagesBarycenter for barycenters on image grids."
    )
