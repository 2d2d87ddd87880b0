r"""Pallas TPU kernels: fused pairwise-cost + streaming reductions.

These kernels replace the KeOps CUDA map-reduce routines of the reference
(``LazyTensor.logsumexp`` at ``_legacy/sinkhorn_samples.py:229-290`` and
``generic_sum`` kernel matvecs at ``_legacy/kernel_samples.py:26,128-137``)
with TPU-native streaming: tiles of ``y`` flow through VMEM while per-row
accumulators (running max / running sum-exp, or weighted channel sums)
live in VMEM scratch — the ``N x M`` interaction matrix is never
materialized in HBM.

Key layout decisions (see the TPU tiling constraints):

* Point clouds are passed **transposed** as ``(D, N)`` / ``(D, M)`` so the
  lane (minor, 128-aligned) dimension is the large point axis; the tiny
  feature dimension ``D`` (1-3 in practice) sits on sublanes. A ``(N, D)``
  layout would waste a 128-lane row per point.
* For ``p = 2`` the cost decomposes through one MXU matmul
  ``scores = x^T y`` plus per-row/per-column biases that are folded
  *outside* the kernel, so the inner loop is exactly a flash-attention
  score block: ``arg = phi_i + psi_j + scores_ij / eps``.
* Accumulators are float32 regardless of the input dtype.
"""

import functools


import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lse_pallas", "gibbs_apply_pallas"]

NEG_INF = -1e30
DEFAULT_BLOCK_N = 512
DEFAULT_BLOCK_M = 2048


def _interpret():
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _pad_axis(arr, axis, target, value=0.0):
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, target - arr.shape[axis])
    if pad[axis][1] == 0:
        return arr
    return jnp.pad(arr, pad, constant_values=value)


# ==============================================================================
#  Streaming LSE (softmin forward)
# ==============================================================================


def _lse_kernel(eps_ref, xT_ref, yT_ref, h_ref, sqx_ref, o_ref, m_ref, s_ref, *, p):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)

    eps = eps_ref[0, 0]
    xT = xT_ref[:]  # (D, BN)
    yT = yT_ref[:]  # (D, BM)
    h = h_ref[:]  # (1, BM)

    scores = lax.dot_general(
        xT,
        yT,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, BM)

    if p == 2:
        sqy_h = 0.5 * jnp.sum(yT * yT, axis=0, keepdims=True)  # (1, BM)
        # Row-constant term |x|^2/(2 eps) is subtracted by the caller.
        arg = (h - sqy_h / eps) + scores / eps
    else:
        sqx = sqx_ref[:]  # (BN, 1)
        sqy = jnp.sum(yT * yT, axis=0, keepdims=True)  # (1, BM)
        d = jnp.sqrt(jnp.maximum(sqx + sqy - 2.0 * scores, 1e-8))
        arg = h - d / eps

    m_prev = m_ref[:]  # (BN, 1)
    blk_max = jnp.max(arg, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, blk_max)
    s_ref[:] = s_ref[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(arg - m_new), axis=1, keepdims=True
    )
    m_ref[:] = m_new

    @pl.when(j == nj - 1)
    def _finalize():
        o_ref[:] = m_ref[:] + jnp.log(s_ref[:])


@functools.partial(jax.jit, static_argnames=("p", "block_n", "block_m"))
def lse_pallas(
    x, y, h, eps, p=2, block_n=DEFAULT_BLOCK_N, block_m=DEFAULT_BLOCK_M
):
    """``out[i] = log sum_j exp(h_j - C_p(x_i, y_j)/eps)`` on TPU.

    Args:
        x: ``(N, D)``; y: ``(M, D)``; h: ``(M,)``; eps: scalar.

    Returns:
        ``(N,)`` float32 LSE values.
    """
    N, D = x.shape
    M, _ = y.shape
    bn = min(block_n, max(128, _cdiv(N, 1)))
    bm = min(block_m, max(128, _cdiv(M, 1)))
    Np, Mp = _cdiv(N, bn) * bn, _cdiv(M, bm) * bm

    f32 = jnp.float32
    xT = _pad_axis(x.astype(f32).T, 1, Np)  # (D, Np)
    yT = _pad_axis(y.astype(f32).T, 1, Mp)  # (D, Mp)
    h2 = _pad_axis(h.astype(f32)[None, :], 1, Mp, value=NEG_INF)  # (1, Mp)
    eps_arr = jnp.asarray(eps, f32).reshape(1, 1)
    sqx = _pad_axis(((x.astype(f32) ** 2).sum(-1))[:, None], 0, Np)  # (Np, 1)

    grid = (Np // bn, Mp // bm)
    out = pl.pallas_call(
        functools.partial(_lse_kernel, p=p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((D, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 1), f32),
        scratch_shapes=[
            pltpu.VMEM((bn, 1), f32),
            pltpu.VMEM((bn, 1), f32),
        ],
        interpret=_interpret(),
    )(eps_arr, xT, yT, h2, sqx)

    out = out[:N, 0]
    if p == 2:
        out = out - 0.5 * (x.astype(f32) ** 2).sum(-1) / jnp.asarray(eps, f32)
    return out


# ==============================================================================
#  Streaming Gibbs-weighted matvec (softmin VJP, MMD matvecs, lazy plans)
# ==============================================================================


def _apply_kernel(
    eps_ref, xT_ref, yT_ref, phi_ref, psi_ref, sqx_ref, VT_ref, o_ref, acc_ref, *, p, kind
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    eps = eps_ref[0, 0]
    xT = xT_ref[:]  # (D, BN)
    yT = yT_ref[:]  # (D, BM)

    scores = lax.dot_general(
        xT,
        yT,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, BM)

    if kind == "energy":
        sqx = sqx_ref[:]
        sqy = jnp.sum(yT * yT, axis=0, keepdims=True)
        d = jnp.sqrt(jnp.maximum(sqx + sqy - 2.0 * scores, 1e-8))
        w = -d
    elif kind == "inv_dist":
        sqx = sqx_ref[:]
        sqy = jnp.sum(yT * yT, axis=0, keepdims=True)
        d = jnp.sqrt(jnp.maximum(sqx + sqy - 2.0 * scores, 1e-8))
        w = 1.0 / jnp.maximum(d, 1e-4)
    elif p == 2:
        # phi/psi arrive pre-folded with the -|.|^2/(2 eps) terms:
        w = jnp.exp(phi_ref[:] + psi_ref[:] + scores / eps)
    else:
        sqx = sqx_ref[:]
        sqy = jnp.sum(yT * yT, axis=0, keepdims=True)
        d = jnp.sqrt(jnp.maximum(sqx + sqy - 2.0 * scores, 1e-8))
        w = jnp.exp(phi_ref[:] + psi_ref[:] - d / eps)
        if kind == "gibbs_grad":
            w = w / jnp.maximum(d, 1e-4)

    # (BN, BM) @ (BM, C) on the MXU, contracting the streamed axis:
    acc_ref[:] += lax.dot_general(
        w,
        VT_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nj - 1)
    def _finalize():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("p", "kind", "block_n", "block_m"))
def gibbs_apply_pallas(
    x,
    y,
    phi,
    psi,
    V,
    eps,
    p=2,
    kind="gibbs",
    block_n=DEFAULT_BLOCK_N,
    block_m=DEFAULT_BLOCK_M,
):
    """``O_i = sum_j w_ij V_j`` with streaming tiles; see
    :func:`geomloss_tpu.ops.softmin.gibbs_apply` for the weight kinds.

    Shapes: x ``(N, D)``, y ``(M, D)``, phi ``(N,)``, psi ``(M,)``,
    V ``(M, C)`` -> ``(N, C)`` float32.
    """
    N, D = x.shape
    M, _ = y.shape
    C = V.shape[-1]
    bn = min(block_n, max(128, N))
    bm = min(block_m, max(128, M))
    Np, Mp = _cdiv(N, bn) * bn, _cdiv(M, bm) * bm

    f32 = jnp.float32
    x32, y32 = x.astype(f32), y.astype(f32)
    eps32 = jnp.asarray(eps, f32)

    if p == 2 and kind not in ("energy", "inv_dist"):
        # Fold the quadratic terms into the biases:
        phi_eff = phi.astype(f32) - 0.5 * (x32**2).sum(-1) / eps32
        psi_eff = psi.astype(f32) - 0.5 * (y32**2).sum(-1) / eps32
    else:
        phi_eff = phi.astype(f32)
        psi_eff = psi.astype(f32)

    xT = _pad_axis(x32.T, 1, Np)
    yT = _pad_axis(y32.T, 1, Mp)
    phi_col = _pad_axis(phi_eff[:, None], 0, Np, value=NEG_INF)  # (Np, 1)
    psi_row = _pad_axis(psi_eff[None, :], 1, Mp, value=NEG_INF)  # (1, Mp)
    sqx = _pad_axis(((x32**2).sum(-1))[:, None], 0, Np)  # (Np, 1)
    VT = _pad_axis(V.astype(f32).T, 1, Mp)  # (C, Mp) — padded V columns are 0

    eps_arr = eps32.reshape(1, 1)

    grid = (Np // bn, Mp // bm)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, p=p, kind=kind),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((D, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, C), f32),
        scratch_shapes=[pltpu.VMEM((bn, C), f32)],
        interpret=_interpret(),
    )(eps_arr, xT, yT, phi_col, psi_row, sqx, VT)

    return out[:N]
