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
  ``scores = x^T y`` plus per-row/per-column biases folded *outside* the
  kernel, so the inner loop is exactly a flash-attention score block.
* **Split-operand f32 matmuls.** The MXU multiplies in bfloat16; a raw
  f32 dot therefore carries ~2^-9 relative noise which, divided by a
  small ``eps``, corrupts Gibbs exponents by O(1). Each coordinate is
  split into three bf16-exact components ``x = x1 + x2 + x3`` and the six
  significant cross terms are evaluated as a *single* ``K = 6 D`` matmul
  at default precision — f32-exact scores (~1e-7) for one MXU pass
  (Mosaic's ``Precision.HIGHEST`` lowering measured ~3.8x slower).
* All exponentials run in base 2: ``log2(e)`` is folded into the biases
  once per block, saving a per-pair multiply in the hot loop.
* Accumulators are float32 regardless of the input dtype. The Gibbs
  matvec splits its weight matrix into two bf16-exact summands so the
  channel contraction is f32-accurate as well.
"""

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "lse_pallas",
    "gibbs_apply_pallas",
    "sinkhorn_step_pallas",
    "sinkhorn_step_sym_pallas",
    "sym_triangle_fits",
]

NEG_INF = -1e30
DEFAULT_BLOCK_N = 1024
DEFAULT_BLOCK_M = 2048

LOG2E = math.log2(math.e)
LN2 = math.log(2.0)


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


def _bf16_trunc(a):
    """Truncate an f32 array to its top 16 bits (a bf16-exact value).

    Implemented with integer mantissa masking rather than an
    ``astype(bf16).astype(f32)`` round-trip: XLA runs with
    ``--xla_allow_excess_precision=true`` and silently *elides* the
    round-trip under jit, which would turn the split into a no-op.
    """
    u = lax.bitcast_convert_type(a, jnp.uint32)
    return lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)


def _split3(a):
    """Exact three-way split ``a == a1 + a2 + a3`` for f32 inputs, with
    every component exactly representable in bfloat16."""
    a1 = _bf16_trunc(a)
    r = a - a1
    a2 = _bf16_trunc(r)
    a3 = r - a2
    return a1, a2, a3


def _split6_pair(xT, yT):
    """Stack the six significant cross terms of the split-operand product.

    Returns ``(xhT, yhT)`` of shape ``(6 D, .)`` such that a bf16 MXU
    contraction of the pair reproduces the f32 product ``x^T y`` to ~1e-7
    relative accuracy: kept terms x1y1, x1y2, x2y1, x1y3, x3y1, x2y2
    (dropped terms are O(2^-27)).
    """
    x1, x2, x3 = _split3(xT)
    y1, y2, y3 = _split3(yT)
    xh = jnp.concatenate([x1, x1, x2, x1, x3, x2], axis=0)
    yh = jnp.concatenate([y1, y2, y1, y3, y1, y2], axis=0)
    return xh, yh


def _scores_dot(xhT, yhT):
    """f32-accurate pairwise dot products from split operands (one MXU pass)."""
    return lax.dot_general(
        xhT,
        yhT,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _vpu_channels(w, VT):
    """Exact-f32 multi-channel weighted row reduction on the VPU:
    ``(BN, BM) x (C, BM) -> (BN, C)``.

    For the gradient applies C = 1 + D <= 4: each channel is one
    broadcast multiply + row reduction over the VMEM-resident weight
    block — fully f32-exact, no bf16 operand splits, and (crucially) no
    extra live (BN, BM) buffers, so the row sub-block stays at the
    C = 1 size instead of shrinking 4x to fit the split-matmul
    buffers (which quadrupled the traversal's step count: the C=4
    sparse apply measured 545 ms vs 194 ms for C=1 at 2M even after
    fixing the MXU layout — the s=4 re-traversal was the residual).
    Measured marginal per extra channel on the C=1 apply: ~15 ms at 2M
    (vs ~180 ms per MXU-split traversal).
    """
    return jnp.concatenate(
        [
            jnp.sum(w * VT[c : c + 1, :], axis=1, keepdims=True)
            for c in range(VT.shape[0])
        ],
        axis=1,
    )


def _vt_dot_w(VT, w):
    """bf16-exact multi-channel contraction, output **transposed**:
    ``(2C, BM) x (BN, BM) -> (C, BN)``.

    The ``(BN, BM) @ (BM, C)`` orientation puts the C = 1 + D = 4 output
    channels of the gradient applies on the MXU *lane* axis, which pads
    4 -> 128: each of the three bf16-split matmuls then costs as much as
    a 128-wide one (~16x the useful MACs) — measured 3.6x fwd cost on
    the truncated last-extrapolation backward (PROFILE_PHASES 2M:
    2591 ms fwd+bwd vs 564 ms fwd). Contracting as ``V @ w^T`` puts C on
    the *sublane* axis (padded only 4 -> 8) and the BN rows on lanes —
    same exactness, ~16x fewer MACs. Callers accumulate ``(C, BN)``
    output blocks and transpose once outside the kernel.

    Exactness: ``w = w1 + w2`` and ``V = V1 + V2`` with every summand
    bf16-representable, so the three retained products reach ~2^-14
    relative accuracy despite the MXU's bf16 multipliers (the dropped
    ``V2 @ w2`` term is O(2^-16) relative).
    """
    C = VT.shape[0] // 2
    V1 = VT[:C, :]
    V2 = VT[C:, :]
    w1 = _bf16_trunc(w)
    w2 = w - w1
    dn = (((1,), (1,)), ((), ()))
    return (
        lax.dot_general(V1, w1, dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
        + lax.dot_general(V2, w1, dimension_numbers=dn,
                          preferred_element_type=jnp.float32)
        + lax.dot_general(V1, w2, dimension_numbers=dn,
                          preferred_element_type=jnp.float32)
    )


# ==============================================================================
#  Streaming LSE (softmin forward)
# ==============================================================================


def _lse_kernel(
    eps_ref, xhT_ref, yhT_ref, h2_ref, sqx_ref, sqy_ref, o_ref, m_ref, s_ref, *, p
):
    """One (BN, BM) tile of the streaming LSE, in base-2 log domain.

    ``h2`` arrives pre-scaled by ``log2(e)`` (for p=2 it also folds the
    column quadratic term); the p=2 row-constant term is handled by the
    caller. The score block is touched by exactly two vector passes
    (block max, then exp2-sum with running-max renormalization) — the
    minimum for an overflow-safe online LSE.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)

    c2 = LOG2E / eps_ref[0, 0]
    h2 = h2_ref[:]  # (1, BM), base-2 units

    scores = _scores_dot(xhT_ref[:], yhT_ref[:])  # (BN, BM)

    if p == 2:
        # One fused multiply-add per pair; biases folded by the caller.
        arg = h2 + scores * c2
    else:
        sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
        # Below ~2e-6 * |x|^2-scale, the expansion form is pure f32
        # cancellation noise (the true distance is ~1e-3 coordinate
        # units): use d = 0 there, like the reference's exactly-
        # cancelling per-pair formula does on the diagonal.
        d = jnp.where(sq > 2e-6 * (sqx_ref[:] + sqy_ref[:]),
                      jnp.sqrt(jnp.maximum(sq, 1e-8)), 0.0)
        arg = h2 - d * c2

    m_prev = m_ref[:]  # (BN, 1)
    blk_max = jnp.max(arg, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, blk_max)
    s_ref[:] = s_ref[:] * jnp.exp2(m_prev - m_new) + jnp.sum(
        jnp.exp2(arg - m_new), axis=1, keepdims=True
    )
    m_ref[:] = m_new

    @pl.when(j == nj - 1)
    def _finalize():
        o_ref[:] = m_ref[:] + jnp.log2(s_ref[:])


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
    eps32 = jnp.asarray(eps, f32)
    x32, y32 = x.astype(f32), y.astype(f32)
    xT = _pad_axis(x32.T, 1, Np)  # (D, Np)
    yT = _pad_axis(y32.T, 1, Mp)  # (D, Mp)
    xhT, yhT = _split6_pair(xT, yT)  # (6 D, .)
    sqx = _pad_axis(((x32**2).sum(-1))[:, None], 0, Np)  # (Np, 1)
    sqy = _pad_axis(((y32**2).sum(-1))[None, :], 1, Mp)  # (1, Mp)

    h2 = h.astype(f32) * LOG2E
    if p == 2:
        # Fold the column quadratic term (the row term is added below):
        h2 = h2 - (0.5 * LOG2E / eps32) * (y32**2).sum(-1)
    h2 = _pad_axis(h2[None, :], 1, Mp, value=NEG_INF)  # (1, Mp)
    eps_arr = eps32.reshape(1, 1)

    K = xhT.shape[0]
    grid = (Np // bn, Mp // bm)
    out = pl.pallas_call(
        functools.partial(_lse_kernel, p=p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 1), f32),
        scratch_shapes=[
            pltpu.VMEM((bn, 1), f32),
            pltpu.VMEM((bn, 1), f32),
        ],
        interpret=_interpret(),
    )(eps_arr, xhT, yhT, h2, sqx, sqy)

    out = out[:N, 0] * LN2  # back to natural-log units
    if p == 2:
        out = out - 0.5 * (x32**2).sum(-1) / eps32
    return out


# ==============================================================================
#  Fused symmetric Sinkhorn step (single-pass absorbed softmin, both directions)
# ==============================================================================
#
# The Jacobi-style Sinkhorn iteration (reference
# ``_legacy/sinkhorn_divergence.py:480-493``) evaluates two softmins per
# cost matrix from the *same* pair of potentials:
#
#     S_xy[i] = -eps log sum_j exp(log b_j + (g_j - C_ij)/eps)
#     S_yx[j] = -eps log sum_i exp(log a_i + (f_i - C_ij)/eps)
#
# Both are recovered from one pass over the "absorbed" Gibbs matrix
#
#     W_ij = exp(log a_i + log b_j + (f_i + g_j - C_ij)/eps),
#
# namely  S_xy = f + eps (log a - log rowsum(W))  and
#         S_yx = g + eps (log b - log colsum(W)):
# half the pair count of two separate softmin sweeps. Moreover, W needs
# **no running-max pass**: after any damped-averaged symmetric update at
# temperature ``eps``, the exact-update bound ``ft_i <= min_j (C_ij - g_j
# - eps log b_j)`` gives ``f + g - C <= -eps (log a_i + log b_j)/2``
# elementwise, i.e. ``W <= 1``; after the next annealing step
# (``eps' = eps * scaling^p >= eps/4`` in practice) the entries stay below
# ``(N M)^{3/2} ~ 2^50`` — far from f32 overflow, so a single exp2-sum
# pass (the 0.69 T pairs/s regime) is safe where the generic two-pass LSE
# kernel (0.45 T pairs/s) is not. Underflowing summands are harmless, and
# a floor on the row/column sums (`_SUM_FLOOR`) turns the impossible
# all-underflow row into a bounded absorbed update (Schmitzer-style
# absorption self-corrects on the next iteration) rather than an inf.
#
# This kernel implements the KeOps ``softmin_online_lazytensor`` semantics
# (``_legacy/sinkhorn_samples.py:229-290``) but fuses the two reduction
# directions that the reference launches as separate CUDA kernels.


def _pair_step_kernel(
    eps_ref, xhT_ref, yhT_ref, phi_ref, psi_ref, sqx_ref, sqy_ref,
    r_ref, c_ref, racc_ref, *, p, with_cols, exact=True
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        racc_ref[:] = jnp.zeros_like(racc_ref)

    c2 = LOG2E / eps_ref[0, 0]
    if p == 2:
        scores = _scores_dot(xhT_ref[:], yhT_ref[:])  # (BN, BM)
        E = phi_ref[:] + (psi_ref[:] + scores * c2)
    else:
        scores = _scores_dot(xhT_ref[:], yhT_ref[:])
        sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
        # Noise floor of the expansion form: f32-split 2e-6 (see
        # _lse_kernel); plain-bf16 warm sweeps carry ~2^-8 relative dot
        # noise instead, so the diagonal-zeroing floor rises with it.
        floor = 2e-6 if exact else 8e-3
        d = jnp.where(sq > floor * (sqx_ref[:] + sqy_ref[:]),
                      jnp.sqrt(jnp.maximum(sq, 1e-8)), 0.0)
        E = phi_ref[:] + (psi_ref[:] - d * c2)
    W = jnp.exp2(E)

    racc_ref[:] += jnp.sum(W, axis=1, keepdims=True)
    if with_cols:
        c_ref[:] = jnp.sum(W, axis=0, keepdims=True)[None]

    @pl.when(j == nj - 1)
    def _finalize():
        r_ref[:] = racc_ref[:]


#: Floor on the absorbed row/column sums: caps the per-iteration potential
#: change at ~85*eps nats instead of producing an inf (see block comment).
_SUM_FLOOR = 1e-37


@functools.partial(
    jax.jit, static_argnames=("p", "sym", "block_n", "block_m", "exact")
)
def sinkhorn_step_pallas(
    x,
    y,
    f,
    g,
    loga,
    logb,
    eps,
    p=2,
    sym=False,
    block_n=DEFAULT_BLOCK_N,
    block_m=DEFAULT_BLOCK_M,
    exact=True,
):
    """Both raw softmin values of one symmetric Sinkhorn iteration.

    Args:
        x: ``(N, D)``; y: ``(M, D)``; f: ``(N,)`` current potential on x;
        g: ``(M,)`` current potential on y; loga/logb: log-weights;
        eps: temperature; sym: if True, the problem is symmetric
        (``y is x``, ``g is f``) and only the row direction is computed.
        exact: with ``False``, skip the 6-channel split-operand expansion
            and feed raw f32 coordinates to the MXU (bf16 multipliers,
            ~6x less matrix work). The pairwise scores then carry
            ``~2^-9 |x||y|`` absolute noise — negligible in the exponent
            for *warm* annealing iterations (``eps >> score noise``), and
            any potential perturbation (``~ the score noise``, eps-free)
            is halved by every later exact averaged update. Callers keep
            the cold tail and every differentiable pass exact.

    Returns:
        ``(S_xy, S_yx)`` with ``S_xy[i] = -eps*LSE_j(logb_j + (g_j - C_ij)/eps)``
        and ``S_yx[j]`` its transpose mate (``None`` when ``sym=True``).
    """
    N, D = x.shape
    M, _ = y.shape
    bn = min(block_n, max(128, N))
    bm = min(block_m, max(128, M))
    Np, Mp = _cdiv(N, bn) * bn, _cdiv(M, bm) * bm

    f32 = jnp.float32
    eps32 = jnp.asarray(eps, f32)
    x32, y32 = x.astype(f32), y.astype(f32)
    f32v, g32v = f.astype(f32), g.astype(f32)
    la, lb = loga.astype(f32), logb.astype(f32)

    # Fold weights, potentials and (p=2) quadratic terms into the biases,
    # in base-2 units:
    phi = (la + f32v / eps32) * LOG2E
    psi = (lb + g32v / eps32) * LOG2E
    if p == 2:
        phi = phi - (0.5 * LOG2E / eps32) * (x32**2).sum(-1)
        psi = psi - (0.5 * LOG2E / eps32) * (y32**2).sum(-1)

    xT = _pad_axis(x32.T, 1, Np)
    yT = _pad_axis(y32.T, 1, Mp)
    if exact:
        xhT, yhT = _split6_pair(xT, yT)
    elif _interpret():
        # Interpret mode computes f32 dots exactly, which would make the
        # warm path untestable off-TPU: emulate the MXU's bf16 operand
        # rounding by truncating the coordinates (slightly conservative —
        # the MXU rounds to nearest, truncation's error is ~2x larger).
        xhT, yhT = _bf16_trunc(xT), _bf16_trunc(yT)
    else:
        xhT, yhT = xT, yT
    phi_col = _pad_axis(phi[:, None], 0, Np, value=NEG_INF)  # (Np, 1)
    psi_row = _pad_axis(psi[None, :], 1, Mp, value=NEG_INF)  # (1, Mp)
    sqx = _pad_axis(((x32**2).sum(-1))[:, None], 0, Np)
    sqy = _pad_axis(((y32**2).sum(-1))[None, :], 1, Mp)
    eps_arr = eps32.reshape(1, 1)

    K = xhT.shape[0]
    ni, nj = Np // bn, Mp // bm
    grid = (ni, nj)
    with_cols = not sym
    out_shapes = [
        jax.ShapeDtypeStruct((Np, 1), f32),
        # Per-row-block column partials, 3D so the (1, bm) tail satisfies
        # the TPU tiling constraint for any ni:
        jax.ShapeDtypeStruct((ni, 1, Mp), f32),
    ]
    out_specs = [
        pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bm), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
    ]
    r, c_part = pl.pallas_call(
        functools.partial(
            _pair_step_kernel, p=p, with_cols=with_cols, exact=exact
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((bn, 1), f32)],
        interpret=_interpret(),
    )(eps_arr, xhT, yhT, phi_col, psi_row, sqx, sqy)

    dt = f.dtype
    r = jnp.maximum(r[:N, 0], _SUM_FLOOR)
    S_xy = (f32v + eps32 * (la - jnp.log(r))).astype(dt)
    if sym:
        return S_xy, None
    c = jnp.maximum(c_part[:, 0, :].sum(0)[:M], _SUM_FLOOR)
    S_yx = (g32v + eps32 * (lb - jnp.log(c))).astype(dt)
    return S_xy, S_yx


# ------------------------------------------------------------------------------
#  Triangle variant for the symmetric (debias) problems
# ------------------------------------------------------------------------------
#
# For the xx / yy softmins the absorbed matrix W is fully symmetric
# (same points, same potential, same weights on both sides), so each
# off-diagonal (I, J) block is computed once: its row sums feed the rows
# of block I and its column sums — equal to the mirror block's row sums —
# feed the rows of block J. This halves the pair count of the debias
# sweeps. The (I, J) schedule is a static row-major upper-triangle walk
# held in SMEM scalar-prefetch tables (row blocks stay resident across
# each I-run, so the row accumulator lives directly in the output block).


def _sym_step_kernel(
    it_ref, jt_ref, eps_ref, xhT_r_ref, xhT_c_ref, phi_col_ref, phi_row_ref,
    sqx_ref, sqy_ref, r_ref, c_ref, *, p, exact=True
):
    t = pl.program_id(0)
    it, jt = it_ref[t], jt_ref[t]

    c2 = LOG2E / eps_ref[0]
    scores = _scores_dot(xhT_r_ref[:], xhT_c_ref[:])  # (bn, bn)
    if p == 2:
        E = phi_col_ref[:] + (phi_row_ref[:] + scores * c2)
    else:
        sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
        # Noise floor of the expansion form: see _pair_step_kernel.
        floor = 2e-6 if exact else 8e-3
        d = jnp.where(sq > floor * (sqx_ref[:] + sqy_ref[:]),
                      jnp.sqrt(jnp.maximum(sq, 1e-8)), 0.0)
        E = phi_col_ref[:] + (phi_row_ref[:] - d * c2)
    W = jnp.exp2(E)

    row = jnp.sum(W, axis=1, keepdims=True)  # (bn, 1)

    @pl.when(jt == it)
    def _first_in_run():
        r_ref[:] = row
        # Diagonal pairs are fully covered by the row sums:
        c_ref[:] = jnp.zeros_like(c_ref)

    @pl.when(jt != it)
    def _accumulate():
        r_ref[:] += row
        c_ref[:] = jnp.sum(W, axis=0, keepdims=True)[None]


#: Upper bound on the SMEM triangle tables (the TPU caps scalar-prefetch
#: operands at ~1 MB total).
_TRI_MAX_STEPS = 98_304

#: Square block side for the triangle walk. Larger blocks amortize the
#: per-step overhead (measured at N=1e5: 512 -> 18.8 ms, 1024 -> 11.1 ms,
#: 1536 -> 10.1 ms per sweep); 1536^2 f32 scores ~ 9.4 MB of VMEM.
SYM_BLOCK = 1536


def _triangle_tables(nb):
    ii, jj = np.triu_indices(nb)
    return jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32)


@functools.partial(jax.jit, static_argnames=("p", "block", "exact"))
def sinkhorn_step_sym_pallas(x, f, loga, eps, p=2, block=SYM_BLOCK,
                             exact=True):
    """Symmetric-problem fused step over the upper triangle only.

    Returns ``S[i] = -eps*LSE_j(loga_j + (f_j - C_ij)/eps)`` (same value
    as ``sinkhorn_step_pallas(x, x, f, f, loga, loga, eps, sym=True)[0]``
    at half the pair count). ``exact=False`` uses plain-bf16 MXU scores
    for warm annealing iterations (see :func:`sinkhorn_step_pallas`).
    """
    N, D = x.shape
    bn = min(block, max(128, N))
    Np = _cdiv(N, bn) * bn
    nb = Np // bn

    f32 = jnp.float32
    eps32 = jnp.asarray(eps, f32)
    x32 = x.astype(f32)
    f32v, la = f.astype(f32), loga.astype(f32)

    phi = (la + f32v / eps32) * LOG2E
    if p == 2:
        phi = phi - (0.5 * LOG2E / eps32) * (x32**2).sum(-1)

    xT = _pad_axis(x32.T, 1, Np)
    if exact:
        xhT, yhT = _split6_pair(xT, xT)
    elif _interpret():
        # Emulate the MXU's bf16 operand rounding off-TPU (see
        # sinkhorn_step_pallas).
        xhT = yhT = _bf16_trunc(xT)
    else:
        xhT, yhT = xT, xT
    phi_col = _pad_axis(phi[:, None], 0, Np, value=NEG_INF)  # (Np, 1)
    phi_row = _pad_axis(phi[None, :], 1, Np, value=NEG_INF)  # (1, Np)
    sqx = _pad_axis(((x32**2).sum(-1))[:, None], 0, Np)
    sqy = _pad_axis(((x32**2).sum(-1))[None, :], 1, Np)

    it_tbl, jt_tbl = _triangle_tables(nb)
    T = it_tbl.shape[0]
    eps_arr = eps32.reshape(1)

    K = xhT.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # it, jt, eps
        grid=(T,),
        in_specs=[
            pl.BlockSpec((K, bn), lambda t, it, jt, eps: (0, it[t])),
            pl.BlockSpec((K, bn), lambda t, it, jt, eps: (0, jt[t])),
            pl.BlockSpec((bn, 1), lambda t, it, jt, eps: (it[t], 0)),
            pl.BlockSpec((1, bn), lambda t, it, jt, eps: (0, jt[t])),
            pl.BlockSpec((bn, 1), lambda t, it, jt, eps: (it[t], 0)),
            pl.BlockSpec((1, bn), lambda t, it, jt, eps: (0, jt[t])),
        ],
        out_specs=[
            pl.BlockSpec((bn, 1), lambda t, it, jt, eps: (it[t], 0)),
            pl.BlockSpec((1, 1, bn), lambda t, it, jt, eps: (t, 0, 0)),
        ],
        scratch_shapes=[],
    )
    r, c_part = pl.pallas_call(
        functools.partial(_sym_step_kernel, p=p, exact=exact),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), f32),
            jax.ShapeDtypeStruct((T, 1, bn), f32),
        ],
        interpret=_interpret(),
    )(it_tbl, jt_tbl, eps_arr, xhT, yhT, phi_col, phi_row, sqx, sqy)

    # Mirror contributions: column sums of block (I, J) are the row sums
    # of the (J, I) block by symmetry.
    c_agg = jax.ops.segment_sum(c_part[:, 0, :], jt_tbl, num_segments=nb)
    r_total = jnp.maximum(r[:, 0] + c_agg.reshape(Np), _SUM_FLOOR)[:N]
    return (f32v + eps32 * (la - jnp.log(r_total))).astype(f.dtype)


def sym_triangle_fits(n, block=SYM_BLOCK):
    """Whether the SMEM triangle tables fit for an ``n``-point cloud."""
    nb = _cdiv(max(n, 1), block)
    return nb * (nb + 1) // 2 <= _TRI_MAX_STEPS


# ==============================================================================
#  Streaming Gibbs-weighted matvec (softmin VJP, MMD matvecs, lazy plans)
# ==============================================================================


def _gibbs_weights(scores, phi, psi, sqx, sqy, eps, *, p, kind):
    """(BN, BM) weight block for the apply kernels; see
    :func:`geomloss_tpu.ops.softmin.gibbs_apply` for the kinds.
    ``phi``/``psi`` arrive pre-folded (quadratic terms for p=2 Gibbs) and
    pre-scaled by log2(e)."""
    if kind == "energy":
        sq = sqx + sqy - 2.0 * scores
        return -jnp.sqrt(jnp.maximum(sq, 1e-8))
    if kind == "inv_dist":
        sq = sqx + sqy - 2.0 * scores
        d = jnp.sqrt(jnp.maximum(sq, 1e-8))
        # Zero below the f32 noise floor of the expansion form — matches the
        # reference's zero gradient in the clamped region (see
        # ops/softmin.py::GRAD_SQDIST_CUT).
        return jnp.where(sq > 1e-6, 1.0 / d, 0.0)
    c2 = LOG2E / eps
    if p == 2:
        # One fused multiply-add + exp2 per pair:
        return jnp.exp2(phi + (psi + scores * c2))
    sq = sqx + sqy - 2.0 * scores
    # f32 noise floor of the expansion form: see _lse_kernel.
    d_safe = jnp.sqrt(jnp.maximum(sq, 1e-8))
    d = jnp.where(sq > 2e-6 * (sqx + sqy), d_safe, 0.0)
    w = jnp.exp2(phi + (psi - d * c2))
    if kind == "gibbs_grad":
        # Zero below the f32 noise floor (ops/softmin.py::GRAD_SQDIST_CUT).
        # Divide by the *un-zeroed* distance: in the sliver where
        # 1e-6 < sq <= 2e-6 * (sqx + sqy) the floored d is 0 and w/d
        # would select inf (matches ops/block_sparse.py:384-396).
        w = jnp.where(sq > 1e-6, w / d_safe, 0.0)
    return w


#: Channel count above which the multi-channel applies switch from the
#: exact-f32 per-channel VPU reduction to the bf16-split transposed MXU
#: contraction (the VPU loop's cost is linear in C; the MXU path is
#: ~flat in C up to the 128-lane width but forces 3 extra live
#: weight-sized VMEM buffers). The gradient applies are C = 1 + D <= 4.
MXU_MIN_CHANNELS = 9


def _apply_kernel(
    eps_ref, xhT_ref, yhT_ref, phi_ref, psi_ref, sqx_ref, sqy_ref, VT_ref,
    o_ref, acc_ref, *, p, kind, mxu
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    scores = _scores_dot(xhT_ref[:], yhT_ref[:])  # (BN, BM)
    w = _gibbs_weights(
        scores, phi_ref[:], psi_ref[:], sqx_ref[:], sqy_ref[:],
        eps_ref[0, 0], p=p, kind=kind,
    )

    if not mxu:
        # Per-channel broadcast multiply + row reduction on the VPU, in
        # full f32 (exact — no bf16 splits, no extra live weight-sized
        # buffers; see _vpu_channels). Also works around Mosaic's refusal
        # to lower a 1-column dot_general into a (non-constant)
        # accumulator.
        acc_ref[:] += _vpu_channels(w, VT_ref[:])
    else:
        # Wide-C path: bf16-exact summand split, transposed (C, BN)
        # accumulation (see _vt_dot_w for the MXU layout rationale):
        acc_ref[:] += _vt_dot_w(VT_ref[:], w)

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
    block_n=512,  # three live (BN, BM) weight blocks must fit in VMEM
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
        # Fold the quadratic terms into the biases, in base-2 units:
        phi_eff = (phi.astype(f32) - 0.5 * (x32**2).sum(-1) / eps32) * LOG2E
        psi_eff = (psi.astype(f32) - 0.5 * (y32**2).sum(-1) / eps32) * LOG2E
    elif kind in ("energy", "inv_dist"):
        phi_eff = phi.astype(f32)
        psi_eff = psi.astype(f32)
    else:  # p = 1 Gibbs kinds: biases in base-2 units
        phi_eff = phi.astype(f32) * LOG2E
        psi_eff = psi.astype(f32) * LOG2E

    xT = _pad_axis(x32.T, 1, Np)
    yT = _pad_axis(y32.T, 1, Mp)
    xhT, yhT = _split6_pair(xT, yT)
    phi_col = _pad_axis(phi_eff[:, None], 0, Np, value=NEG_INF)  # (Np, 1)
    psi_row = _pad_axis(psi_eff[None, :], 1, Mp, value=NEG_INF)  # (1, Mp)
    sqx = _pad_axis(((x32**2).sum(-1))[:, None], 0, Np)  # (Np, 1)
    sqy = _pad_axis(((y32**2).sum(-1))[None, :], 1, Mp)  # (1, Mp)
    VT = _pad_axis(V.astype(f32).T, 1, Mp)  # (C, Mp) — padded V columns are 0
    mxu = C >= MXU_MIN_CHANNELS
    if mxu:
        # Split V into bf16-exact summands, stacked along the channel axis
        # (C < MXU_MIN_CHANNELS uses exact f32 VPU row reductions instead):
        VT1 = _bf16_trunc(VT)
        VT = jnp.concatenate([VT1, VT - VT1], axis=0)  # (2 C, Mp)

    eps_arr = eps32.reshape(1, 1)

    K = xhT.shape[0]
    grid = (Np // bn, Mp // bm)
    if not mxu:
        out_specs = pl.BlockSpec(
            (bn, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((Np, C), f32)
        scratch = pltpu.VMEM((bn, C), f32)
    else:
        # Transposed accumulation (see _vt_dot_w): (C, bn) blocks.
        out_specs = pl.BlockSpec(
            (C, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((C, Np), f32)
        scratch = pltpu.VMEM((C, bn), f32)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, p=p, kind=kind, mxu=mxu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((VT.shape[0], bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[scratch],
        interpret=_interpret(),
    )(eps_arr, xhT, yhT, phi_col, psi_row, sqx, sqy, VT)

    return out[:N] if not mxu else out.T[:N]

