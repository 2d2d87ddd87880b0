r"""``ot.solve_grid`` / ``ot.barycenter_grid`` — OT on 1D/2D/3D grids.

The reference ships only non-functional scaffolding here
(``/root/reference/src/geomloss/ot/_implementations/grid.py:215-250``:
``solve_grid`` returns a broken ``OTResult(potentials)`` call and
``barycenter_grid`` references undefined names). We provide **working**
implementations built on the separable grid Sinkhorn machinery:

* ``solve_grid`` runs the multiscale grid solver of
  :func:`geomloss_tpu.models.sinkhorn_images.sinkhorn_divergence` and
  returns an ``OTResultGrid`` whose density/plan operators apply the
  separable Gibbs kernel in the log domain (no giant ``(prod N)^2``
  matrices).
* ``barycenter_grid`` wraps the debiased multiscale barycenter loop
  (:func:`geomloss_tpu.models.barycenter_images.ImagesBarycenter`,
  generalized in spirit) for 2D grids.

Following the reference's grid conventions, the domain is the unit cube
with coordinates ``arange(N)/N`` per axis and the ground cost is
``|x - y|^p / p`` (separable: Euclidean for p=2, Manhattan for p=1).
"""

import jax
import jax.numpy as jnp

from ..models.sinkhorn_images import sinkhorn_divergence
from ..ops.grid import softmin_grid
from ..solvers.sinkhorn_loop import sinkhorn_cost as legacy_sinkhorn_cost
from ..utils.cache import lazy_properties
from ..utils.typing import SinkhornPotentials
from ..utils.validation import ArrayProperties, convert_inputs
from .result import LinearOperator, OTResult

__all__ = ["solve_grid", "barycenter_grid", "OTResultGrid"]


def _log_apply(eps, p, log_v, g_over_eps, D):
    """log sum_j exp(log_v_j + g_j/eps - C_ij/eps), separably."""
    return -softmin_grid(eps, p, log_v + g_over_eps, D=D) / eps


@lazy_properties
class OTResultGrid(OTResult):
    """Result of an OT problem between grid measures.

    ``density_operator`` applies the transport-plan density through
    separable log-domain convolutions: memory stays linear in the grid
    size even though the implicit plan has ``(prod N)^2`` entries.
    """

    def __init__(self, *, a, b, p, reg, unbalanced, debias, potentials, array_properties):
        super().__init__(
            a=a,
            b=b,
            potentials=potentials,
            array_properties=array_properties,
            batchsize=array_properties.B,
            reg=reg,
            reg_type="KL",
            unbalanced=unbalanced,
            unbalanced_type="KL",
            debias=debias,
        )
        self._p = p
        self._D = a.ndim - 1
        grid_shape = a.shape[1:]
        B = array_properties.B
        self._shapes = {
            "a": (B,) + grid_shape,
            "b": (B,) + grid_shape,
            "B": (B,),
        }

    _cached_properties = (
        "potential_a",
        "potential_b",
        "potential_aa",
        "potential_bb",
        "density_operator",
        "plan_operator",
        "value",
        "marginal_a",
        "marginal_b",
        "citation",
    )

    def _value(self):
        """Sinkhorn cost from the dual potentials (legacy grid convention:
        eps = blur**p, cost |x-y|^p / p)."""
        pots = self._potentials
        return legacy_sinkhorn_cost(
            self._reg,
            self._unbalanced,
            self._a,
            self._b,
            pots.f_aa,
            pots.g_bb,
            pots.g_ab,
            pots.f_ba,
            batch=True,
            debias=self._debias,
        )

    def _density_operator(self):
        """Separable, log-domain application of the plan density
        exp((f + g - C)/eps). Supports signed inputs via a pos/neg split."""
        eps, p, D = self._reg, self._p, self._D
        f = self._potentials.f_ba
        g = self._potentials.g_ab

        def apply_one_sign(v, g_pot, f_pot):
            log_v = jnp.where(v > 0, jnp.log(jnp.maximum(v, 1e-45)), -1e4)
            lse = _log_apply(eps, p, log_v, g_pot / eps, D)
            return jnp.exp(f_pot / eps + lse)

        def matmat(s):  # s: (B, *grid, V)
            s = jnp.moveaxis(s, -1, 0)  # (V, B, *grid)

            def one(v):
                pos = apply_one_sign(jnp.maximum(v, 0.0), g, f)
                neg = apply_one_sign(jnp.maximum(-v, 0.0), g, f)
                return pos - neg

            out = jax.vmap(one)(s)
            return jnp.moveaxis(out, 0, -1)

        def rmatmat(s):
            s = jnp.moveaxis(s, -1, 0)

            def one(v):
                pos = apply_one_sign(jnp.maximum(v, 0.0), f, g)
                neg = apply_one_sign(jnp.maximum(-v, 0.0), f, g)
                return pos - neg

            out = jax.vmap(one)(s)
            return jnp.moveaxis(out, 0, -1)

        return LinearOperator.from_streaming(
            matmat=matmat,
            rmatmat=rmatmat,
            input_shape=self._shapes["b"],
            output_shape=self._shapes["a"],
        )


@convert_inputs("a", "b")
def solve_grid(
    a=None,
    b=None,
    cost="sqeuclidean",
    axes=None,
    periodic=False,
    p=None,
    blur=None,
    reach=None,
    reg=None,
    unbalanced=None,
    debias=True,
    scaling=0.5,
    method="auto",
    max_iter=None,
    tol=None,
) -> OTResultGrid:
    r"""Solves an OT problem between measures sampled on a common grid.

    Args:
        a, b: ``(B, Nx[, Ny[, Nz]])`` non-negative densities on the unit
            cube (a batch axis is required, as in the reference's contract).
        cost / p: ``"sqeuclidean"`` (p=2, cost |x-y|^2/2 separable) or p=1
            (separable Manhattan cost).
        blur: geometric regularization shortcut, ``reg = blur**p``
            (legacy grid convention — note this differs from
            ``solve_sample``'s ``p * blur**p``).
        reach: unbalanced shortcut, ``unbalanced = reach**p``.
        scaling: epsilon-annealing ratio in [0.5, 1).

    Returns:
        :class:`OTResultGrid` with lazily-computed ``value``,
        ``potential_a/b``, ``marginal_a/b`` and separable
        ``density_operator`` / ``plan_operator``.
    """
    if a is None or b is None:
        raise ValueError("solve_grid requires both 'a' and 'b' densities.")
    if axes is not None or (periodic is not False and periodic is not None):
        raise NotImplementedError(
            "Custom axes and periodic boundaries are not supported yet; "
            "the grid lives on the unit cube [0,1)^D."
        )
    if cost == "sqeuclidean":
        p = 2 if p is None else p
    if p not in (1, 2):
        raise NotImplementedError("Only p = 1 or 2 are supported on grids.")

    if reg is not None:
        if blur is not None:
            raise ValueError(
                "Parameters 'reg' and 'blur' are redundant. "
                "Please specify only one of them."
            )
        blur = reg ** (1.0 / p)
    if unbalanced is not None:
        if reach is not None:
            raise ValueError(
                "Parameters 'unbalanced' and 'reach' are redundant. "
                "Please specify only one of them."
            )
        reach = unbalanced ** (1.0 / p)

    D = a.ndim - 1
    if D not in (1, 2, 3):
        raise ValueError(
            "Expected batched grids (B, Nx[, Ny[, Nz]]); "
            f"received an array of shape {a.shape}."
        )
    if a.shape != b.shape:
        raise ValueError(
            f"'a' and 'b' should live on the same grid; received {a.shape} "
            f"and {b.shape}."
        )

    (f_aa, g_bb, g_ab, f_ba), reg_val = sinkhorn_divergence(
        a,
        b,
        p=p,
        blur=blur,
        reach=reach,
        scaling=scaling,
        debias=debias,
        _return_raw_potentials=True,
    )
    rho = None if reach is None else reach**p

    array_properties = ArrayProperties(
        B=a.shape[0],
        N=int(jnp.prod(jnp.asarray(a.shape[1:]))),
        M=int(jnp.prod(jnp.asarray(b.shape[1:]))),
        dtype=a.dtype,
        device=str(getattr(a, "device", "cpu")),
        library="jax",
    )

    return OTResultGrid(
        a=a,
        b=b,
        p=p,
        reg=reg_val,
        unbalanced=rho,
        debias=debias,
        potentials=SinkhornPotentials(f_aa=f_aa, g_bb=g_bb, g_ab=g_ab, f_ba=f_ba),
        array_properties=array_properties,
    )


def barycenter_grid(
    a=None,
    weights=None,
    blur=0,
    p=2,
    scaling_N=10,
    backward_iterations=5,
    **kwargs,
):
    """Debiased Sinkhorn barycenter of measures on a 1D/2D/3D grid.

    Working implementation of the reference's stub (``grid.py:245-250``):
    wraps the multiscale barycenter loop of
    :func:`geomloss_tpu.models.barycenter_images.ImagesBarycenter`.

    Args:
        a: ``(B, K, Nx[, Ny[, Nz]])`` batch of K densities per problem
            (1D signals, 2D images or 3D volumes).
        weights: ``(B, K)`` barycentric weights.

    Returns:
        ``(B, Nx[, Ny[, Nz]])`` array of barycenter masses.
    """
    from ..models.barycenter_images import ImagesBarycenter

    if a is None:
        raise ValueError("barycenter_grid requires the densities 'a'.")
    if a.ndim not in (3, 4, 5):
        raise ValueError(
            "barycenter_grid expects (B, K, Nx[, Ny[, Nz]]) densities; "
            f"received shape {a.shape}."
        )
    if weights is None:
        B, K = a.shape[:2]
        weights = jnp.full((B, K), 1.0 / K, dtype=a.dtype)

    bar = ImagesBarycenter(
        a,
        weights,
        blur=blur,
        p=p,
        scaling_N=scaling_N,
        backward_iterations=backward_iterations,
    )
    return bar[:, 0]
