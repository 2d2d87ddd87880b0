r"""Grid (signal/image/volume) primitives: pyramids, upsampling, separable
soft and hard C-transforms.

Re-design of the reference's grid utilities
(``/root/reference/src/geomloss/_legacy/utils.py:69-279``). The key
primitive is the **separable softmin**: on a regular grid with the
:math:`|x - y|^p / p` cost, the D-dimensional soft-C-transform factors
into D one-dimensional log-convolutions (one per axis).

TPU-native formulation: the reference runs each 1D pass as a KeOps LSE.
Here, each pass is a *stabilized matmul-exp*:

.. math::
    \text{out}_i = m + \log \sum_j K_{ij} \, e^{A_j - m}, \qquad
    K_{ij} = e^{-c(x_i - x_j)} \le 1,

i.e. a dense ``(N, N)`` kernel matrix applied on the MXU (``N`` is the
grid side — a few hundred at most — so the 1D matrices are tiny), with a
per-row running max for stability. This turns the whole grid Sinkhorn
loop into a sequence of batched matrix products.
"""

import math


import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "log_dens",
    "pyramid",
    "upsample",
    "softmin_grid",
    "softmin_grid_coords",
    "axis_kernel_log",
    "C_transform",
]


def log_dens(a):
    """log(a) with zero/negative densities clamped to -10000
    (reference ``utils.py:105-108`` — N.B. the grid clamp differs from the
    -100000 used for point clouds)."""
    return jnp.where(a > 0, jnp.log(jnp.maximum(a, 1e-30)), -10000.0)  # 1e-30 floor: TPU flushes subnormals, 0*inf grad = NaN


def _sum_pool2(a, D):
    """Sum-pool by a factor 2 over the last D axes (mass-preserving)."""
    window = (1,) * (a.ndim - D) + (2,) * D
    return lax.reduce_window(a, 0.0, lax.add, window, window, "VALID")


def pyramid(a, D=None):
    """Multiscale decomposition (Binary/Quad/OcTree): list of sum-pooled
    grids, coarsest first (reference ``utils.py:88-97``).

    Args:
        a: array whose last ``D`` axes are the grid axes.
        D: grid dimensionality; defaults to ``a.ndim - 1`` (one batch axis).
    """
    if D is None:
        D = a.ndim - 1
    a_s = [a]
    for _ in range(int(math.log2(a.shape[-1]))):
        a = _sum_pool2(a, D)
        a_s.append(a)
    a_s.reverse()
    return a_s


def upsample(a, D=None):
    """x2 bi/trilinear upsampling over the last D axes
    (reference ``utils.py:100-102``, torch ``align_corners=False``)."""
    if D is None:
        D = a.ndim - 1
    new_shape = a.shape[:-D] + tuple(2 * s for s in a.shape[-D:])
    return jax.image.resize(a, new_shape, method="linear")


def _axis_kernel_log(N, eps, p, dtype):
    """Log of the 1D Gibbs kernel on the unit interval with
    ``x = arange(N)/N`` (reference ``utils.py:235-242``) — the unit-cube
    special case of :func:`axis_kernel_log`."""
    return axis_kernel_log(jnp.arange(N, dtype=dtype) / N, eps, p)


def _lse_axis(A, K_log):
    """Stabilized log-matmul-exp along the last axis:
    ``out[..., i] = log sum_j exp(K_log[i, j] + A[..., j])``.

    Since ``max_j K_log[i, j] = 0``, shifting by the per-row max of A keeps
    every exponential in (0, 1] and the sum in (0, N]: one MXU matmul plus
    cheap elementwise work.
    """
    m = lax.stop_gradient(jnp.max(A, axis=-1, keepdims=True))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    expA = jnp.exp(A - m)
    K = jnp.exp(K_log)  # (N, N), entries in (0, 1]
    # HIGHEST: the TPU MXU multiplies in bf16 by default, which injects ~0.2%
    # relative noise into the Gibbs weights (see ops/costs.py::COORD_PRECISION).
    conv = jnp.matmul(
        expA, K.T, preferred_element_type=expA.dtype,
        precision=lax.Precision.HIGHEST,
    )
    # N.B.: the floor must be a NORMAL float for the dtype — f32 subnormals
    # (anything below ~1.18e-38) flush to zero, which would turn the floor
    # into a no-op and the log into -inf on empty rows:
    floor = 1e-300 if A.dtype == jnp.float64 else 1e-30
    return m + jnp.log(jnp.maximum(conv, floor))


def axis_kernel_log(coords, eps, p, period=None):
    """Log of the 1D Gibbs kernel for arbitrary axis coordinates:
    ``K_log[i, j] = -d(x_i, x_j)^p / (p * eps)`` with the torus metric
    ``d = min(|xi - xj|, period - |xi - xj|)`` when ``period`` is given.

    Implements the per-axis generalization behind ``ot.solve_grid``'s
    documented ``axes=`` / ``periodic=`` parameters (the reference ships
    only the docstring, ``ot/_implementations/grid.py:224-236``).
    """
    diff = jnp.abs(coords[:, None] - coords[None, :])
    if period is not None:
        diff = jnp.minimum(diff, period - diff)
    if p == 2:
        return -(diff**2) / (2 * eps)
    elif p == 1:
        return -diff / eps
    raise NotImplementedError(f"p={p} is not supported on grids.")


def softmin_grid_coords(eps, p, h_y, coords, periods=None, D=None):
    """Separable soft-C-transform with explicit per-axis coordinates and
    optional per-axis periodicity (see :func:`axis_kernel_log`).

    Args:
        coords: D-tuple of ``(N_d,)`` coordinate arrays.
        periods: D-tuple of floats or ``None`` entries.
    """
    if D is None:
        D = h_y.ndim - 1
    if periods is None:
        periods = (None,) * D
    out = h_y
    for d, axis in enumerate(range(h_y.ndim - D, h_y.ndim)):
        K_log = axis_kernel_log(
            jnp.asarray(coords[d], out.dtype), eps, p, period=periods[d]
        )
        moved = jnp.moveaxis(out, axis, -1)
        moved = _lse_axis(moved, K_log)
        out = jnp.moveaxis(moved, -1, axis)
    return -eps * out


def softmin_grid(eps, C_xy, h_y, D=None):
    r"""Separable soft-C-transform on a regular grid over the unit cube.

    ``f = -eps * log sum_j exp(h_j - C(x_i, y_j)/eps)`` where the sum runs
    over all grid points and ``C = |x - y|^p / p``; computed as D
    successive 1D passes (reference ``softmin_grid``, ``utils.py:190-279``).

    Args:
        eps: temperature.
        C_xy: the integer ``p`` (the grid cost is implicit).
        h_y: ``(..., N_1, ..., N_D)`` dual array; all leading axes are batch.
        D: number of grid axes; defaults to ``h_y.ndim - 1``.

    Returns:
        Array of the same shape as ``h_y``.
    """
    p = C_xy
    if D is None:
        D = h_y.ndim - 1
    out = h_y
    for axis in range(h_y.ndim - D, h_y.ndim):
        N = out.shape[axis]
        K_log = _axis_kernel_log(N, eps, p, out.dtype)
        moved = jnp.moveaxis(out, axis, -1)
        moved = _lse_axis(moved, K_log)
        out = jnp.moveaxis(moved, -1, axis)
    return -eps * out


def C_transform(G, tau=1, p=2, D=None):
    r"""Hard (max-plus) C-transform on a grid:
    ``F(x_i) = max_j [G(x_j) - C(x_i, x_j)]`` with
    ``C(x, y) = |x - y|^p / (p * tau)``, computed separably
    (reference ``utils.py:116-182``; pixel coordinates 0..N-1).
    """
    if D is None:
        D = G.ndim - 1
    out = G
    for axis in range(G.ndim - D, G.ndim):
        N = out.shape[axis]
        x = jnp.arange(N, dtype=out.dtype)
        diff = x[:, None] - x[None, :]
        if p == 1:
            K = -jnp.abs(diff) / tau
        elif p == 2:
            K = -(diff**2) / (2 * tau)
        else:
            raise NotImplementedError()
        moved = jnp.moveaxis(out, axis, -1)
        moved = jnp.max(moved[..., None, :] + K, axis=-1)
        out = jnp.moveaxis(moved, -1, axis)
    return out
