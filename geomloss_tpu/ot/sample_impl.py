r"""``ot.solve_sample`` — OT between point clouds, cost computed on the fly.

Re-implementation of
``/root/reference/src/geomloss/ot/_implementations/sample.py``: the
``sqeuclidean`` cost (NO 1/p factor: ``reg = p * blur**p``), the
unbatched softmin with eps limit cases, and the ``OTResultSample`` result
whose "lazy" density/plan are streaming LinearOperators (our TPU-native
replacement for KeOps LazyTensors).
"""

import jax
import jax.numpy as jnp

from ..ops.softmin import gibbs_apply, lse_points
from ..solvers.annealing import annealing_parameters, max_diameter
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
from .solve_matrix import stable_log

__all__ = ["solve_sample", "solve_sample_batch", "OTResultSample", "barycenter_sample"]

#: Above this many cost-matrix entries, OTResultSample switches to
#: streaming (never-materialized) operators for density/plan application.
STREAMING_THRESHOLD = 5000 * 5000


def squared_distances(x, y, *, matrix_type="dense"):
    """Reference ``sample.py:38-66`` (the "lazy" branch becomes streaming
    operators at the OTResult level on TPU)."""
    N, D = x.shape
    M, D_ = y.shape
    assert D == D_, "x and y should have the same number of coordinates per sample."
    D_xx = (x * x).sum(-1).reshape(N, 1)
    D_xy = x @ y.T
    D_yy = (y * y).sum(-1).reshape(1, M)
    return D_xx - 2 * D_xy + D_yy


def cost_matrix(x, y, cost="sqeuclidean", matrix_type="dense"):
    if cost == "sqeuclidean":
        return squared_distances(x, y, matrix_type=matrix_type)
    raise NotImplementedError()


def softmin_sample(eps, log_weights, costs, potentials):
    r"""Unbatched softmin with eps = 0 / +infinity limit cases
    (reference ``sample.py:91-180``). ``costs`` is either a dense ``(N, M)``
    matrix or a pair of point clouds ``(x, y)`` for the streaming path."""
    log_b_y, g_y = log_weights, potentials

    if isinstance(costs, tuple):
        # Streaming path: fused cost + online LSE (Pallas on TPU).
        x, y = costs
        if isinstance(eps, float) and eps == float("inf"):
            # f_i = sum_j b_j (|x_i - y_j|^2 - g_j) / sum(b): expand the square
            # to get a closed form in O(N + M) — no pairwise matrix needed.
            b_y = jnp.exp(log_b_y)
            sum_b = b_y.sum()
            sq_x = (x * x).sum(-1)  # (N,)
            wy = (b_y[:, None] * y).sum(0)  # (D,)
            cst = (b_y * (y * y).sum(-1)).sum() - jnp.dot(b_y, g_y)
            f_i = sq_x * sum_b - 2.0 * (x @ wy) + cst
            return f_i / sum_b
        elif isinstance(eps, float) and eps == 0:
            raise NotImplementedError(
                "eps = 0 is not supported by the streaming softmin."
            )
        else:
            e = jnp.asarray(eps, x.dtype)
            h = log_b_y + g_y / e
            # C = squared distances (no 1/2!): scale points by sqrt(2)
            # so that |u - v|^2 / 2 == |x - y|^2.
            sq2 = jnp.sqrt(jnp.asarray(2.0, x.dtype))
            return -e * lse_points(sq2 * x, sq2 * y, h, e, 2, "auto")

    C_xy = costs
    assert len(C_xy.shape) == 2, "C_xy should be a (N,M) Tensor."
    N, M = C_xy.shape
    assert g_y.shape == (M,)
    assert log_b_y.shape == (M,)

    if isinstance(eps, float) and eps == float("inf"):
        b_y = jnp.exp(log_b_y)
        sum_b = b_y.sum(axis=0, keepdims=True)
        f_i = ((C_xy - g_y[None, :]) * b_y[None, :]).sum(axis=1)
        return f_i / sum_b
    elif isinstance(eps, float) and eps == 0:
        return jnp.min(C_xy - g_y[None, :], axis=1)
    else:
        scores_xy = (log_b_y + g_y / eps)[None, :] - C_xy / eps
        return -eps * jax.nn.logsumexp(scores_xy, axis=1)


@lazy_properties
class OTResultSample(OTResult):
    """Result of an OT problem computed from point positions
    (reference ``sample.py:443-639``)."""

    def __init__(
        self,
        *,
        X_a,
        X_b,
        a,
        b,
        C,
        cost,
        reg,
        reg_type,
        unbalanced,
        unbalanced_type,
        debias,
        potentials,
        array_properties,
    ):
        super().__init__(
            a=a,
            b=b,
            potentials=potentials,
            array_properties=array_properties,
            batchsize=0,
            reg=reg,
            reg_type=reg_type,
            unbalanced=unbalanced,
            unbalanced_type=unbalanced_type,
            debias=debias,
        )
        self._X_a = X_a
        self._X_b = X_b
        self._cost = cost
        self._C_streaming = isinstance(C.xy, tuple) if C is not None else True
        self._C_dense = None if self._C_streaming else C

        ap = self._array_properties
        if ap.B == 0:
            self._shapes = {
                "a": (ap.N,),
                "b": (ap.M,),
                "C": (ap.N, ap.M),
                "B": (),
            }
        else:
            raise NotImplementedError()

    def _density(self):
        r"""Density $P_{ij} = \exp((f_i + g_j - C(x_i,y_j))/\varepsilon)$ as a
        dense array (reference ``sample.py:510-560``)."""
        if self._C_dense is None:
            self._C_dense = CostMatrices(
                xy=cost_matrix(self._X_a, self._X_b, cost=self._cost),
                yx=None,
            )
        ap = self._array_properties
        C = self._C_dense.xy
        f = self._potentials.f_ba
        g = self._potentials.g_ab
        eps = self._reg
        if self._reg_type != "KL":
            raise NotImplementedError(
                "Currently, we only support 'KL' as regularization for the OT problem."
            )
        assert eps > 0
        P_ij = jnp.exp((f[:, None] + g[None, :] - C) / eps)
        return self.cast(P_ij, "C")

    def _lazy_density(self):
        """Density as a streaming LinearOperator (TPU-native analogue of the
        reference's KeOps LazyTensor, ``sample.py:562-588``)."""
        ap = self._array_properties
        f = self._potentials.f_ba
        g = self._potentials.g_ab
        eps = jnp.asarray(self._reg, self._X_a.dtype)
        x, y = self._X_a, self._X_b
        sq2 = jnp.sqrt(jnp.asarray(2.0, x.dtype))

        def matmat(s):  # (M, V) -> (N, V)
            return gibbs_apply(sq2 * x, sq2 * y, f / eps, g / eps, s, eps, 2)

        def rmatmat(s):  # (N, V) -> (M, V)
            return gibbs_apply(sq2 * y, sq2 * x, g / eps, f / eps, s, eps, 2)

        return LinearOperator.from_streaming(
            matmat=matmat,
            rmatmat=rmatmat,
            input_shape=self._shapes["b"],
            output_shape=self._shapes["a"],
        )

    def _density_operator(self):
        """Density of the transport plan, as a :class:`LinearOperator`."""
        ap = self._array_properties
        if ap.N * ap.M > STREAMING_THRESHOLD:
            return self.lazy_density
        return LinearOperator.from_dense(
            self.density,
            input_shape=self._shapes["b"],
            output_shape=self._shapes["a"],
        )

    def _plan(self):
        """Transport plan, encoded as a dense array."""
        density = self.density
        P_ij = density * self._a[:, None] * self._b[None, :]
        return self.cast(P_ij, "C")

    def _lazy_plan(self):
        """Transport plan, as a streaming LinearOperator."""
        return self.lazy_density.rescale(
            input_scaling=self.cast(self._b, "b"),
            output_scaling=self.cast(self._a, "a"),
        )

    def _value_linear(self):
        r"""Linear transport cost $\langle \pi, C \rangle$ for the squared
        Euclidean cost, computed in O(N + M) memory from plan moments:
        $\sum_{ij} \pi_{ij} |x_i - y_j|^2 =
        \sum_i \mu_i |x_i|^2 + \sum_j \nu_j |y_j|^2
        - 2 \sum_i x_i \cdot (\pi y)_i$
        where $\mu, \nu$ are the plan's marginals."""
        if self._cost is not None:
            # Custom cost: fall back to the dense plan:
            plan = self.plan
            C = cost_matrix(self._X_a, self._X_b, cost=self._cost)
            return self.cast(jnp.sum(plan * C), "B")
        x, y = self._X_a, self._X_b
        mu = self.marginal_a
        nu = self.marginal_b
        cross = jnp.sum(x * (self.plan_operator @ y))
        return self.cast(
            jnp.dot(mu, (x**2).sum(-1))
            + jnp.dot(nu, (y**2).sum(-1))
            - 2.0 * cross,
            "B",
        )

    # Barycentric mappings ===============================================================
    def _a_to_b(self):
        r"""Barycentric map: for each source point $x_i$, the plan-weighted
        average target position $\sum_j \pi_{ij} y_j / \sum_j \pi_{ij}$."""
        mass = self.density_operator @ self._b  # (N,)
        targets = self.density_operator @ (self._b[:, None] * self._X_b)  # (N, D)
        return targets / jnp.maximum(mass, 1e-30)[:, None]

    def _b_to_a(self):
        r"""Barycentric map from the target to the source points."""
        mass = self.density_operator.T @ self._a  # (M,)
        sources = self.density_operator.T @ (self._a[:, None] * self._X_a)  # (M, D)
        return sources / jnp.maximum(mass, 1e-30)[:, None]


@convert_inputs("X_a", "X_b", "a", "b")
def solve_sample(
    X_a,
    X_b,
    a=None,
    b=None,
    cost="sqeuclidean",
    debias=False,
    reg=None,
    unbalanced=None,
    unbalanced_type="KL",
    method="auto",
    max_iter=None,
    tol=None,
    blur=None,
    reach=None,
) -> OTResultSample:
    r"""Solves an OT problem between point clouds (reference ``sample.py:189-395``).

    The cost is ``C(x, y) = |x - y|^2`` (``"sqeuclidean"``, no 1/p factor):
    the geometric shortcuts are ``reg = p * blur**p`` and
    ``unbalanced = p * reach**p``.

    Above ~5k x 5k points, the solver automatically switches to streaming
    softmin kernels (Pallas on TPU) so the cost matrix is never
    materialized, and the result's ``density_operator`` / ``lazy_plan``
    are streaming operators.

    Example:
        >>> import numpy as np
        >>> from geomloss_tpu import ot
        >>> sol = ot.solve_sample(X_a=[[0., 0.], [1., 1.]],
        ...                       X_b=[[0., 1.], [1., 0.]],
        ...                       reg=0.01, max_iter=200)
        >>> print(round(float(sol.value_linear), 3))
        1.0
        >>> print(np.asarray(sol.plan).round(2))
        [[0.25 0.25]
         [0.25 0.25]]
        >>> print(np.asarray(sol.a_to_b).round(2))
        [[0.5 0.5]
         [0.5 0.5]]
    """
    if cost == "sqeuclidean":
        p = 2
    else:
        p = 1

    if blur is not None:
        if reg is not None:
            raise ValueError(
                "Parameters 'reg' and 'blur' are redundant. "
                "Please specify only one of them."
            )
        reg = p * (blur**p)

    if reach is not None:
        if unbalanced is not None:
            raise ValueError(
                "Parameters 'unbalanced' and 'reach' are redundant. "
                "Please specify only one of them."
            )
        unbalanced = p * (reach**p)

    check_regularization(
        reg=reg,
        unbalanced=unbalanced,
        unbalanced_type=unbalanced_type,
        method=method,
        tol=tol,
        max_iter=max_iter,
        allowed_methods=("auto", "multiscale"),
    )

    if len(X_a.shape) != 2:
        raise ValueError(f"Expected X_a to be a (N, D) array. Received {X_a.shape}.")
    if len(X_b.shape) != 2:
        raise ValueError(f"Expected X_b to be a (M, D) array. Received {X_b.shape}.")
    N, D = X_a.shape
    M, D_ = X_b.shape
    if D != D_:
        raise ValueError(
            "Expected X_a and X_b to have the same number of coordinates per sample. "
            f"Received D={D} for X_a and D={D_} for X_b."
        )

    a = check_marginal(a, ones_like=X_a[:, 0], marginal_size=N, name="a")
    b = check_marginal(b, ones_like=X_b[:, 0], marginal_size=M, name="b")

    if unbalanced is None:
        check_marginal_masses(
            a.sum(axis=0, keepdims=True), b.sum(axis=0, keepdims=True)
        )

    library, dtype, device = check_library_dtype_device(X_a, X_b, a, b)
    array_properties = ArrayProperties(
        B=0, N=N, M=M, dtype=dtype, device=device, library=library
    )

    if method == "multiscale":
        return _solve_sample_multiscale(
            X_a, X_b, a, b, cost=cost, debias=debias, reg=reg,
            unbalanced=unbalanced, unbalanced_type=unbalanced_type,
            max_iter=max_iter, array_properties=array_properties,
        )

    descent = annealing_parameters(
        maxmin_cost=max_diameter(X_a, X_b) ** p,
        eps=reg,
        rho=unbalanced,
        n_iter=max_iter,
    )

    use_streaming = N * M > STREAMING_THRESHOLD
    if use_streaming:
        C_xy, C_yx = (X_a, X_b), (X_b, X_a)
        C_xx = (X_a, X_a) if debias else None
        C_yy = (X_b, X_b) if debias else None
    else:
        C_xy = cost_matrix(X_a, X_b, cost=cost)
        C_yx = cost_matrix(X_b, X_a, cost=cost)
        C_xx = cost_matrix(X_a, X_a, cost=cost) if debias else None
        C_yy = cost_matrix(X_b, X_b, cost=cost) if debias else None

    C_list = [CostMatrices(xy=C_xy, yx=C_yx, xx=C_xx, yy=C_yy)]

    potentials = sinkhorn_loop(
        softmin=softmin_sample,
        log_a_list=[stable_log(a)],
        log_b_list=[stable_log(b)],
        C_list=C_list,
        descent=descent,
        debias=debias,
        last_extrapolation=True,
    )

    return OTResultSample(
        X_a=X_a,
        X_b=X_b,
        a=a,
        b=b,
        C=C_list[-1],
        cost=cost,
        reg=reg,
        reg_type="KL",
        unbalanced=unbalanced,
        unbalanced_type=unbalanced_type,
        debias=debias,
        potentials=potentials,
        array_properties=array_properties,
    )


def _cluster_measure(w, pts, block):
    """Hilbert-order labels + pooled coarse measure (ceil(N/block) blocks,
    last one ragged — fine here: pooling is label-based segment_sums, not
    fixed-shape tiles)."""
    from ..ops.spatial import hilbert_key, radix_sort_perm

    n = pts.shape[0]
    K = -(-n // block)
    perm = radix_sort_perm(
        hilbert_key(pts.astype(jnp.float32), bits=8),
        total_bits=pts.shape[1] * 8,
    )
    lab_sorted = (jnp.arange(n) // block).astype(jnp.int32)
    labels = jnp.zeros(n, jnp.int32).at[perm].set(lab_sorted)
    wc = jax.ops.segment_sum(w, labels, num_segments=K)
    cent = jax.ops.segment_sum(w[:, None] * pts, labels, num_segments=K)
    cent = cent / jnp.maximum(wc, 1e-30)[:, None]
    return wc, cent, labels


#: "Pruned" fine-cost value of the new-API truncation (finite, like the
#: jump-branch tests: keeps the dense logsumexp NaN-free).
_PRUNED_COST = 1.0e5


def _solve_sample_multiscale(
    X_a, X_b, a, b, *, cost, debias, reg, unbalanced, unbalanced_type,
    max_iter, array_properties,
):
    """Two-scale (clustered) descent through the abstract loop's jump
    branch — a public front-end for the machinery that is unreachable
    dead code upstream (reference ``sinkhorn_ot.py:299-412``; no caller
    builds a multi-scale ``C_list`` there).

    Clusters are Hilbert-ordered blocks; the coarse iterations run on
    weighted centroids until the temperature resolves the cluster size,
    then ``kernel_truncation`` prunes fine cost entries whose clusters
    fail the reference keep rule ``f + g > C - truncate * eps`` and
    ``extrapolate`` carries the duals down (coupled extrapolation).
    Dense-matrix scale only (use ``SamplesLoss(backend="multiscale")``
    for streaming clouds).
    """
    N, D = X_a.shape
    M, _ = X_b.shape
    if N * M > STREAMING_THRESHOLD:
        raise NotImplementedError(
            "method='multiscale' on ot.solve_sample builds dense two-scale "
            "cost matrices; for larger clouds use the streaming "
            "SamplesLoss(..., backend='multiscale') solver."
        )
    if min(N, M) < 64:
        raise ValueError(
            "method='multiscale' needs at least 64 points per cloud "
            f"(received {N} x {M})."
        )

    # Cluster both clouds; force distinct coarse sizes so the four
    # problems (xy, yx, xx, yy) are shape-identifiable inside the
    # truncation/extrapolation callables:
    bx = max(4, 1 << max(0, (N // 64).bit_length() - 1))
    by = max(4, 1 << max(0, (M // 64).bit_length() - 1))
    while -(-N // bx) == -(-M // by):
        by *= 2
    aw_c, x_c, lab_a = _cluster_measure(a, X_a, bx)
    bw_c, y_c, lab_b = _cluster_measure(b, X_b, by)
    Kx, Ky = aw_c.shape[0], bw_c.shape[0]

    C_coarse = CostMatrices(
        xy=cost_matrix(x_c, y_c, cost=cost),
        yx=cost_matrix(y_c, x_c, cost=cost),
        xx=cost_matrix(x_c, x_c, cost=cost) if debias else None,
        yy=cost_matrix(y_c, y_c, cost=cost) if debias else None,
    )
    C_fine = CostMatrices(
        xy=cost_matrix(X_a, X_b, cost=cost),
        yx=cost_matrix(X_b, X_a, cost=cost),
        xx=cost_matrix(X_a, X_a, cost=cost) if debias else None,
        yy=cost_matrix(X_b, X_b, cost=cost) if debias else None,
    )

    # Jump temperature: the squared cluster size (sqeuclidean cost units;
    # the legacy jump rule, ``_legacy/sinkhorn_samples.py:592-597``):
    sigma2 = 4.0 * float(
        jnp.maximum(
            ((X_a - x_c[lab_a]) ** 2).sum(-1).max(),
            ((X_b - y_c[lab_b]) ** 2).sum(-1).max(),
        )
    )
    sigma2 = max(sigma2, 1.001 * reg)

    descent = annealing_parameters(
        maxmin_cost=max_diameter(X_a, X_b) ** 2,
        eps=reg,
        rho=unbalanced,
        n_iter=max_iter,
        eps_scales=[sigma2, reg],
    )

    labels = {
        (Kx, Ky): (lab_a, lab_b),
        (Ky, Kx): (lab_b, lab_a),
        (Kx, Kx): (lab_a, lab_a),
        (Ky, Ky): (lab_b, lab_b),
    }
    rows_of = {Kx: X_a, Ky: X_b}
    cents_of = {Kx: x_c, Ky: y_c}
    mixed = {}

    def kernel_truncation(*, C, C_fine, f, eps, CT=None, CT_fine=None,
                          g=None, truncate=5.0):
        g_c = f if g is None else g
        keep = f[:, None] + g_c[None, :] > C - truncate * eps
        la, lb = labels[C.shape]
        keep_f = keep[la[:, None], lb[None, :]]
        Cf = jnp.where(keep_f, C_fine, _PRUNED_COST)
        CfT = (
            jnp.where(keep_f.T, CT_fine, _PRUNED_COST)
            if CT_fine is not None else None
        )
        return Cf, CfT

    def extrapolate(*, self, other, log_weights, C, C_fine, eps, dampen):
        key = (self.shape[0], log_weights.shape[0])
        if key not in mixed:
            mixed[key] = cost_matrix(
                rows_of[key[0]], cents_of[key[1]], cost=cost
            )
        return dampen(softmin_sample(eps, log_weights, mixed[key], other))

    potentials = sinkhorn_loop(
        softmin=softmin_sample,
        log_a_list=[stable_log(aw_c), stable_log(a)],
        log_b_list=[stable_log(bw_c), stable_log(b)],
        C_list=[C_coarse, C_fine],
        descent=descent,
        kernel_truncation=kernel_truncation,
        extrapolate=extrapolate,
        debias=debias,
        last_extrapolation=True,
    )

    return OTResultSample(
        X_a=X_a,
        X_b=X_b,
        a=a,
        b=b,
        C=C_fine,
        cost=cost,
        reg=reg,
        reg_type="KL",
        unbalanced=unbalanced,
        unbalanced_type=unbalanced_type,
        debias=debias,
        potentials=potentials,
        array_properties=array_properties,
    )


@convert_inputs("X_a", "X_b", "a", "b")
def solve_sample_batch(
    X_a,
    X_b,
    a=None,
    b=None,
    cost="sqeuclidean",
    debias=False,
    reg=None,
    unbalanced=None,
    unbalanced_type="KL",
    method="auto",
    max_iter=None,
    tol=None,
    blur=None,
    reach=None,
):
    r"""Batched :func:`solve_sample`: B point-cloud OT problems in parallel.

    The reference leaves this unimplemented (``sample.py:405-430`` raises);
    here the single-problem solver core is ``jax.vmap``-ed over the batch
    axis (one annealing schedule, computed from the global diameter).

    Args:
        X_a: ``(B, N, D)``; X_b: ``(B, M, D)``;
        a: ``(B, N)``; b: ``(B, M)`` (default: uniform).

    Returns:
        list of B :class:`OTResultSample` objects (one per problem, with
        all lazy attributes available).
    """
    if cost == "sqeuclidean":
        p = 2
    else:
        p = 1
    if blur is not None:
        if reg is not None:
            raise ValueError(
                "Parameters 'reg' and 'blur' are redundant. "
                "Please specify only one of them."
            )
        reg = p * (blur**p)
    if reach is not None:
        if unbalanced is not None:
            raise ValueError(
                "Parameters 'unbalanced' and 'reach' are redundant. "
                "Please specify only one of them."
            )
        unbalanced = p * (reach**p)

    check_regularization(
        reg=reg,
        unbalanced=unbalanced,
        unbalanced_type=unbalanced_type,
        method=method,
        tol=tol,
        max_iter=max_iter,
    )

    if len(X_a.shape) != 3 or len(X_b.shape) != 3:
        raise ValueError(
            "Expected X_a, X_b to be (B, N, D) / (B, M, D) arrays. "
            f"Received {X_a.shape} and {X_b.shape}."
        )
    B, N, D = X_a.shape
    B2, M, D2 = X_b.shape
    if B != B2 or D != D2:
        raise ValueError(
            "X_a and X_b should share the batch size and feature dimension; "
            f"received {X_a.shape} and {X_b.shape}."
        )

    a = check_marginal(a, ones_like=X_a[:, :, 0], marginal_size=N, name="a")
    b = check_marginal(b, ones_like=X_b[:, :, 0], marginal_size=M, name="b")
    if unbalanced is None:
        check_marginal_masses(a.sum(axis=1), b.sum(axis=1))

    library, dtype, device = check_library_dtype_device(X_a, X_b, a, b)

    # One shared schedule from the global diameter (like solve_batch's
    # shared max-min cost, matrix.py:660-665):
    diam = max_diameter(X_a.reshape(-1, D), X_b.reshape(-1, D))
    descent = annealing_parameters(
        maxmin_cost=diam**p,
        eps=reg,
        rho=unbalanced,
        n_iter=max_iter,
    )

    use_streaming = N * M > STREAMING_THRESHOLD

    def solve_one(xa, xb, aa, bb):
        if use_streaming:
            C_xy, C_yx = (xa, xb), (xb, xa)
            C_xx = (xa, xa) if debias else None
            C_yy = (xb, xb) if debias else None
        else:
            C_xy = cost_matrix(xa, xb, cost=cost)
            C_yx = cost_matrix(xb, xa, cost=cost)
            C_xx = cost_matrix(xa, xa, cost=cost) if debias else None
            C_yy = cost_matrix(xb, xb, cost=cost) if debias else None
        return sinkhorn_loop(
            softmin=softmin_sample,
            log_a_list=[stable_log(aa)],
            log_b_list=[stable_log(bb)],
            C_list=[CostMatrices(xy=C_xy, yx=C_yx, xx=C_xx, yy=C_yy)],
            descent=descent,
            debias=debias,
            last_extrapolation=True,
        )

    potentials_batch = jax.vmap(solve_one)(X_a, X_b, a, b)

    array_properties = ArrayProperties(
        B=0, N=N, M=M, dtype=dtype, device=device, library=library
    )
    results = []
    for k in range(B):
        pots_k = jax.tree.map(
            lambda v: None if v is None else v[k], potentials_batch
        )
        C_k = (
            CostMatrices(xy=(X_a[k], X_b[k]), yx=(X_b[k], X_a[k]))
            if use_streaming
            else CostMatrices(xy=cost_matrix(X_a[k], X_b[k], cost=cost), yx=None)
        )
        results.append(
            OTResultSample(
                X_a=X_a[k],
                X_b=X_b[k],
                a=a[k],
                b=b[k],
                C=C_k,
                cost=cost,
                reg=reg,
                reg_type="KL",
                unbalanced=unbalanced,
                unbalanced_type=unbalanced_type,
                debias=debias,
                potentials=pots_k,
                array_properties=array_properties,
            )
        )
    return results


def barycenter_sample(
    xa,
    a=None,
    weights=None,
    *,
    blur=0.01,
    p=2,
    n_iter=8,
    scaling=0.5,
    diameter=None,
    init=None,
    step_size=1.0,
):
    r"""Free-support Wasserstein barycenter of K point clouds.

    Minimizes ``sum_k weights[k] * S_blur(bar, alpha_k)`` (debiased
    Sinkhorn divergences) over the *positions* of a uniform ``M``-point
    barycenter, with the mass-preconditioned fixed-point update

    .. math:: z \leftarrow z - \frac{1}{m}\nabla_z
              \sum_k w_k S_\varepsilon(\mathrm{unif}(z), \alpha_k)
            = \sum_k w_k T_k(z) - (T_{\mathrm{self}}(z) - z),

    where ``T_k`` is the debiased barycentric map onto measure ``k`` —
    the quasi-Newton step that is exact for quadratic (p=2) geometry.
    **Working implementation of the reference's non-functional stub**
    (``/root/reference/src/geomloss/ot/_implementations/sample.py:644-652``,
    shape conventions from its comments). Each update reuses the full
    ``SamplesLoss`` machinery, so the per-measure solves stream on TPU
    (online/multiscale backends) and scale to large clouds.

    Args:
        xa: ``(N, D)``, ``(K, N, D)`` or ``(B, K, N, D)`` point clouds.
        a: per-point masses, matching leading shape ``(..., N)``
            (default uniform; the barycenter support is always uniform).
        weights: ``(K,)`` or ``(B, K)`` barycentric weights
            (default uniform ``1/K``).
        blur: target blur scale of the debiased divergences.
        p: cost exponent (2 recommended; 1 runs a subgradient flow).
        n_iter: number of fixed-point updates (static).
        scaling: epsilon-annealing rate of each inner solve.
        diameter: optional static bound on the point-cloud diameter
            (required under ``jax.jit``, like ``SamplesLoss``).
        init: optional ``(M, D)`` / ``(B, M, D)`` initial support
            (default: the index-wise ``weights``-mix of the input clouds).
        step_size: scale of the preconditioned update (1 = full step).

    Returns:
        :class:`BarycenterResult` with uniform ``masses`` ``(M,)`` or
        ``(B, M)`` and ``samples`` ``(M, D)`` or ``(B, M, D)``.
    """
    from ..models.samples_loss import SamplesLoss
    from .solve_matrix import BarycenterResult

    xa = jnp.asarray(xa)
    if xa.ndim == 2:
        xa = xa[None, None]
        batched = False
    elif xa.ndim == 3:
        xa = xa[None]
        batched = False
    elif xa.ndim == 4:
        batched = True
    else:
        raise ValueError(
            "barycenter_sample expects (N, D), (K, N, D) or (B, K, N, D) "
            f"point clouds; received shape {tuple(xa.shape)}."
        )
    B, K, N, D = xa.shape
    dtype = xa.dtype

    if a is None:
        a = jnp.full((B, K, N), 1.0 / N, dtype=dtype)
    else:
        a = jnp.asarray(a, dtype).reshape((B, K, N))
        a = a / a.sum(axis=-1, keepdims=True)
    if weights is None:
        weights = jnp.full((B, K), 1.0 / K, dtype=dtype)
    else:
        weights = jnp.asarray(weights, dtype)
        weights = jnp.broadcast_to(weights.reshape((-1, K)), (B, K))
        weights = weights / weights.sum(axis=1, keepdims=True)

    if init is None:
        # Index-wise mix: exact for degenerate weights, a reasonable seed
        # otherwise (the fixed point washes out the pairing).
        z = jnp.einsum("bk,bknd->bnd", weights, xa)
    else:
        z = jnp.asarray(init, dtype)
        if z.ndim == 2:
            z = jnp.broadcast_to(z[None], (B,) + z.shape)
    M = z.shape[1]
    m = jnp.full((B, M), 1.0 / M, dtype=dtype)

    if diameter is None:
        pts = xa.reshape(B * K * N, D)
        diameter = float(max_diameter(pts, pts))

    loss = SamplesLoss(
        "sinkhorn", p=p, blur=blur, scaling=scaling, diameter=diameter,
        debias=True, backend="auto",
    )

    # The whole fixed-point descent is ONE traced program: the K-measure
    # objective is a ``lax.scan`` (the solver body compiles once and loops),
    # the B problems run under ``lax.map``, and the ``n_iter`` updates are a
    # ``lax.scan`` over the carry ``z`` — no per-step retracing, unlike a
    # naive Python loop of ``jax.grad`` calls.
    def run(z, m, a, xa, weights):
        barycenter_sample._trace_count += 1  # test hook: traces per call

        def objective_b(zb, mb, ab, xab, wb):
            def body(tot, inp):
                wk, ak, xk = inp
                return tot + wk * loss(mb, zb, ak, xk), None

            tot, _ = jax.lax.scan(
                body, jnp.zeros((), zb.dtype), (wb, ab, xab)
            )
            return tot

        def update_b(args):
            zb, mb, ab, xab, wb = args
            grad = jax.grad(objective_b)(zb, mb, ab, xab, wb)
            return zb - step_size * grad / mb[:, None]

        def step(z, _):
            z = jax.lax.map(
                lambda args: update_b(args), (z, m, a, xa, weights)
            )
            return z, None

        z, _ = jax.lax.scan(step, z, None, length=n_iter)
        return z

    z = jax.jit(run)(z, m, a, xa, weights)

    masses, samples = m, z
    if not batched:
        masses, samples = masses[0], samples[0]
    return BarycenterResult(masses=masses, samples=samples, reg=p * blur**p)


#: Number of times the ``barycenter_sample`` descent body has been traced
#: (one per call; NOT per iteration/measure — see ``tests/test_barycenter
#: _matrix_sample.py``).
barycenter_sample._trace_count = 0
