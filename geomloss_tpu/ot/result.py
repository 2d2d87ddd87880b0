r"""``OTResult`` and ``LinearOperator`` — the rich result API of ``ot.solve*``.

Re-implementation of ``/root/reference/src/geomloss/ot/_ot_result.py``.
Everything expensive (plan, value, marginals...) is a lazily-computed
cached property. Where the reference wraps KeOps LazyTensors for the
"lazy" transport plan, we expose :class:`LinearOperator` objects backed by
the streaming Gibbs kernel (``ops.softmin.gibbs_apply`` — Pallas on TPU),
so plans of 10^10+ entries can be applied to vectors without ever being
materialized.
"""

import math

import jax.numpy as jnp

from ..solvers.unbalanced import sinkhorn_cost
from ..utils.cache import (
    add_cached_methods_to_sphinx,
    cache_clear,
    cache_methods_and_properties,
)

__all__ = ["LinearOperator", "OTResult"]


class LinearOperator:
    """Linear operator applied to arrays without being instantiated as a matrix.

    Mirrors the reference's ``LinearOperator`` (``_ot_result.py:7-161``):
    ``@`` application, ``.T``/``transpose()``, ``shape``, ``from_dense``,
    ``from_streaming`` (our replacement for ``from_lazy_tensor``) and
    ``rescale``.
    """

    def __init__(self, *, matmat, rmatmat, input_shape, output_shape):
        self._matmat = matmat
        self._rmatmat = rmatmat
        self._input_shape = tuple(input_shape)
        self._output_shape = tuple(output_shape)

    def __matmul__(self, x):
        if (
            len(x.shape) < len(self._input_shape)
            or x.shape[: len(self._input_shape)] != self._input_shape
        ):
            raise ValueError(
                f"Expects an input of shape {self._input_shape} with, maybe, "
                f"additional trailing dimensions, but found an array of "
                f"shape {x.shape}."
            )
        trailing_shape = x.shape[len(self._input_shape):]
        x_reshaped = x.reshape(self._input_shape + (-1,))
        out = self._matmat(x_reshaped)
        return out.reshape(self._output_shape + trailing_shape)

    @property
    def shape(self):
        """For compatibility with SciPy's LinearOperator class."""
        return (math.prod(self._output_shape), math.prod(self._input_shape))

    def transpose(self):
        """Returns the transposed linear operator."""
        return LinearOperator(
            matmat=self._rmatmat,
            rmatmat=self._matmat,
            input_shape=self._output_shape,
            output_shape=self._input_shape,
        )

    @property
    def T(self):
        """Alias for :meth:`transpose`."""
        return self.transpose()

    @classmethod
    def from_dense(cls, dense_matrix, *, input_shape, output_shape):
        """A :class:`LinearOperator` that behaves like the given dense matrix."""
        if len(dense_matrix.shape) == 2:
            N, M = dense_matrix.shape
            assert input_shape == (M,)
            assert output_shape == (N,)

            def matmat(s):
                return dense_matrix @ s

            def rmatmat(s):
                return dense_matrix.T @ s

        elif len(dense_matrix.shape) == 3:
            B, N, M = dense_matrix.shape
            assert input_shape == (B, M)
            assert output_shape == (B, N)

            def matmat(s):
                return dense_matrix @ s

            def rmatmat(s):
                return jnp.swapaxes(dense_matrix, 1, 2) @ s

        else:
            raise ValueError(
                "Expected a dense matrix of shape (N, M) or (B, N, M), "
                f"but found an array of shape {dense_matrix.shape}."
            )

        return cls(
            matmat=matmat,
            rmatmat=rmatmat,
            input_shape=input_shape,
            output_shape=output_shape,
        )

    @classmethod
    def from_streaming(cls, *, matmat, rmatmat, input_shape, output_shape):
        """A :class:`LinearOperator` backed by streaming (never-materialized)
        kernels — the TPU-native analogue of ``from_lazy_tensor``."""
        return cls(
            matmat=matmat,
            rmatmat=rmatmat,
            input_shape=input_shape,
            output_shape=output_shape,
        )

    def rescale(self, *, input_scaling, output_scaling):
        """diag(output_scaling) @ self @ diag(input_scaling)."""
        b = input_scaling
        a = output_scaling
        assert a.shape == self._output_shape
        assert b.shape == self._input_shape

        def matmat(s):
            return a[..., None] * (self @ (b[..., None] * s))

        def rmatmat(s):
            return b[..., None] * (self.T @ (a[..., None] * s))

        return LinearOperator(
            matmat=matmat,
            rmatmat=rmatmat,
            input_shape=self._input_shape,
            output_shape=self._output_shape,
        )


@add_cached_methods_to_sphinx
class OTResult:
    """Abstract base class for optimal transport results.

    Solvers return subclasses (``OTResultMatrix``, ``OTResultSample``...)
    whose attributes (``plan``, ``value``, ``marginal_a``...) are computed
    lazily and cached (reference ``_ot_result.py:164-455``).
    """

    def __init__(
        self,
        *,
        a,
        b,
        potentials,
        array_properties,
        batchsize,
        reg,
        reg_type,
        unbalanced,
        unbalanced_type,
        debias,
        C=None,
        value=None,
        value_linear=None,
        plan=None,
        log=None,
        backend=None,
        sparse_plan=None,
        lazy_plan=None,
    ):
        self._a = a
        self._b = b
        self._C = C
        self._potentials = potentials
        self._array_properties = array_properties
        self._batchsize = batchsize

        self._reg = reg
        self._reg_type = reg_type
        self._unbalanced = unbalanced
        self._unbalanced_type = unbalanced_type
        self._debias = debias

        self._value = value
        self._value_linear = value_linear
        self._plan = plan
        self._log = log
        self._sparse_plan = sparse_plan
        self._lazy_plan = lazy_plan
        self._backend = backend

        cache_methods_and_properties(
            cls=self.__class__,
            instance=self,
            cache_size=1,
        )

    _cached_methods = ()
    _cached_properties = (
        "potential_a",
        "potential_b",
        "potential_aa",
        "potential_bb",
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
        "a_to_b",
        "b_to_a",
        "citation",
    )

    cache_clear = cache_clear

    def cast(self, x, shape):
        return jnp.asarray(x, dtype=self._array_properties.dtype).reshape(
            self._shapes[shape]
        )

    # Dual potentials ====================================================================
    def _potential_a(self):
        r"""First dual potential $f$, associated to the source measure $\alpha$."""
        return self.cast(self._potentials.f_ba, "a")

    def _potential_b(self):
        r"""Second dual potential $g$, associated to the target measure $\beta$."""
        return self.cast(self._potentials.g_ab, "b")

    def _potential_aa(self):
        r"""Dual potential of the self-interaction of the source measure $\alpha$."""
        if self._potentials.f_aa is None:
            raise ValueError(
                "The self-interaction potential `f_aa` is not defined. "
                "To fix this issue, run your OT solver with `debias = True`."
            )
        return self.cast(self._potentials.f_aa, "a")

    def _potential_bb(self):
        r"""Dual potential of the self-interaction of the target measure $\beta$."""
        if self._potentials.g_bb is None:
            raise ValueError(
                "The self-interaction potential `g_bb` is not defined. "
                "To fix this issue, run your OT solver with `debias = True`."
            )
        return self.cast(self._potentials.g_bb, "b")

    # Transport plan =====================================================================
    def _density(self):
        """Density of the transport plan w.r.t. the reference measure (dense)."""
        return None

    def _lazy_density(self):
        """Density of the transport plan, as a streaming LinearOperator."""
        return None

    def _density_operator(self):
        """Density of the transport plan, encoded as a linear operator."""
        return None

    def _plan(self):
        """Transport plan, encoded as a dense array."""
        return None

    def _lazy_plan(self):
        """Transport plan, as a streaming (never materialized) LinearOperator."""
        return None

    def _plan_operator(self):
        """Transport plan, encoded as a linear operator."""
        a = self.cast(self._a, "a")
        b = self.cast(self._b, "b")
        return self.density_operator.rescale(input_scaling=b, output_scaling=a)

    # Loss values ========================================================================
    def _value(self):
        """Full transport cost, including possible regularization terms."""
        if self._reg_type != "KL":
            raise NotImplementedError(
                "Currently, we only support 'KL' as regularization for the OT problem."
            )
        if self._unbalanced_type != "KL":
            raise NotImplementedError(
                "Currently, we only support 'KL' as regularization "
                "for the marginal constraints."
            )
        values = sinkhorn_cost(
            a=self._a,
            b=self._b,
            potentials=self._potentials,
            eps=self._reg,
            rho=self._unbalanced,
            debias=self._debias,
            batchsize=self._batchsize,
        )
        return self.cast(values, "B")

    def _value_linear(self):
        r"""Linear part of the transport cost, $\langle \pi, C \rangle$,
        without regularization or marginal-penalty terms (reference
        ``_ot_result.py`` ``value_linear``). Computed from the plan
        operator, so streaming results never materialize the plan."""
        if self._C is not None:
            plan = self.plan
            C = self.cast(self._C, "C")
            axes = tuple(range(plan.ndim - 2, plan.ndim))
            return self.cast(jnp.sum(plan * C, axis=axes), "B")
        return None

    # Marginal constraints ===============================================================
    def _marginal_a(self):
        r"""First marginal of the transport plan, with the shape of `a`."""
        a = self.cast(self._a, "a")
        b = self.cast(self._b, "b")
        density = self.density_operator @ b
        assert density.shape == a.shape
        return self.cast(a * density, "a")

    def _marginal_b(self):
        r"""Second marginal of the transport plan, with the shape of `b`."""
        a = self.cast(self._a, "a")
        b = self.cast(self._b, "b")
        density = self.density_operator.T @ a
        assert density.shape == b.shape
        return self.cast(b * density, "b")

    # Barycentric mappings ===============================================================
    def _a_to_b(self):
        """Displacement vectors from the first to the second measure."""
        return None

    def _b_to_a(self):
        """Displacement vectors from the second to the first measure."""
        return None

    # Miscellaneous ======================================================================
    def _citation(self):
        r"""Appropriate citation(s) for this result."""
        return r"""GeomLoss library:

            "Interpolating between optimal transport and MMD using Sinkhorn divergences."
            In The 22nd International Conference on Artificial Intelligence and Statistics, pp. 2681-2690. PMLR, 2019.
            Feydy, Jean, Thibault Séjourné, François-Xavier Vialard, Shun-ichi Amari, Alain Trouvé, and Gabriel Peyré.

            @inproceedings{feydy2019interpolating,
                title={Interpolating between Optimal Transport and MMD using Sinkhorn Divergences},
                author={Feydy, Jean and S{\'e}journ{\'e}, Thibault and Vialard, Fran{\c{c}}ois-Xavier and Amari, Shun-ichi and Trouve, Alain and Peyr{\'e}, Gabriel},
                booktitle={The 22nd International Conference on Artificial Intelligence and Statistics},
                pages={2681--2690},
                year={2019}
            }
        """
