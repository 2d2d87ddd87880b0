r"""Block-sparse streaming kernels: the TPU kernel-truncation engine.

The reference prunes fine-scale Sinkhorn iterations with KeOps
block-sparse "ranges" built from ragged voxel clusters
(``_legacy/sinkhorn_samples.py:493-530``). The TPU-native formulation
works at the granularity of **fixed kernel tiles** over spatially-sorted
points:

* each row-tile ``I`` (``block_n`` sorted points) precomputes a list of
  column-tiles ``cols[I]`` it must visit, selected by a keep-score
  ``max_I f + max_J g - C_lb(I, J) + truncate * eps`` where ``C_lb`` is a
  rigorous lower bound on the pairwise cost between the two tiles
  (centroid distance minus radii);
* the Pallas kernels receive ``cols``/``counts`` as scalar-prefetch
  operands: the grid's inner dimension is a *static cap* on the number of
  visited tiles, the index map gathers the right ``y`` tile for each step,
  and steps beyond ``counts[I]`` are masked out (their index map repeats
  the previous tile, so no DMA is issued).

The static cap makes shapes jit-stable; when the true neighbor count
exceeds it, we keep the highest-scoring tiles (the truncation is a
controlled approximation in the reference as well).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from typing import NamedTuple

from .costs import COORD_PRECISION
from .pallas_kernels import (
    LN2,
    LOG2E,
    MXU_MIN_CHANNELS,
    _bf16_trunc,
    _scores_dot,
    _split6_pair,
    _vpu_channels,
    _vt_dot_w,
)

NEG_INF = -1e30

#: Row tiles per kernel launch. The ``cols`` tables are scalar-prefetch
#: (SMEM) operands padded to 128 lanes on the minor axis — ``rows * 512``
#: bytes against a ~1 MB per-launch budget, whatever the cap. Tables with
#: more rows are split into chunks of this many rows and launched through
#: a ``lax.scan`` (one compiled kernel, ``nI / MAX_TABLE_ROWS`` launches),
#: which keeps the kernel tile size *independent* of the point count —
#: previously ``tile`` had to grow with N to respect the SMEM budget,
#: inflating visited pairs ~9x over the truncation ideal at N = 4e6.
MAX_TABLE_ROWS = 1024

__all__ = [
    "tile_stats",
    "build_tile_masks",
    "TileMask",
    "lse_sparse",
    "gibbs_apply_sparse",
    "softmin_sparse",
    "sinkhorn_step_sparse",
    "softmin_extrapolation_sparse",
    "softmin_extrapolation_sparse_sym",
    "retighten_counts",
    "kernel_matvec_sparse",
    "masks_from_geometry",
]


class TileMask(NamedTuple):
    """Block-sparsity pattern of a truncated pairwise interaction.

    ``cols/counts`` drive row-major traversal (reduce over y for each x
    tile); ``colsT/countsT`` drive the transposed traversal, needed by the
    backward pass and by the yx-direction softmin. ``vals/valsT`` (when
    kept) are the sorted keep scores behind ``cols`` — they let
    :func:`retighten_counts` re-threshold the same tables at later
    annealing temperatures.
    """

    cols: jnp.ndarray  # (N/bn, cap) int32
    counts: jnp.ndarray  # (N/bn,) int32
    colsT: jnp.ndarray  # (M/bm, capT) int32
    countsT: jnp.ndarray  # (M/bm,) int32
    vals: jnp.ndarray = None  # (N/bn, cap) keep scores (sorted desc)
    valsT: jnp.ndarray = None  # (M/bm, capT)

    def transpose(self):
        return TileMask(
            cols=self.colsT, counts=self.countsT,
            colsT=self.cols, countsT=self.counts,
            vals=self.valsT, valsT=self.vals,
        )

    def with_counts(self, counts, countsT):
        return self._replace(counts=counts, countsT=countsT)


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


def _col(cols, counts, i, j):
    """Column-tile index of grid step ``(i, j)``: steps past ``counts[i]``
    repeat the last kept tile, so the block index never changes there and
    the pipeline issues no DMA for masked steps — making a generous
    static ``cap`` nearly free."""
    return cols[i, jnp.minimum(j, counts[i] - 1)]


def _launch_chunked(launch, nI, cols, counts, row_ops):
    """Split a sparse row traversal into SMEM-budget-sized launches.

    ``launch(cols_c, counts_c, *row_op_chunks) -> (rows_c, C)`` runs the
    kernel on one chunk of table rows; ``row_ops`` is a list of
    ``(array, chunk_axis)`` row-indexed operands (column-side operands are
    captured by the closure and shared across chunks). Chunks run inside a
    ``lax.scan`` so the kernel compiles once however many launches the
    table needs.
    """
    if nI <= MAX_TABLE_ROWS:
        return launch(cols, counts, *[a for a, _ in row_ops])
    # Balanced chunks: the driver pads point counts to the kernel tile
    # only, so nI is rarely a multiple of MAX_TABLE_ROWS. Pad with
    # single-block dummy rows (counts = 1, pointing at tile 0) whose
    # output rows are sliced off below.
    nc = -(-nI // MAX_TABLE_ROWS)
    rows_c = -(-nI // nc)
    nIp = nc * rows_c

    def split(a, ax, fill):
        sh = a.shape
        k = sh[ax] // nI
        pad = [(0, 0)] * a.ndim
        pad[ax] = (0, (nIp - nI) * k)
        if pad[ax][1]:
            a = jnp.pad(a, pad, constant_values=fill)
        sh = a.shape
        new = sh[:ax] + (nc, rows_c * k) + sh[ax + 1:]
        return jnp.moveaxis(a.reshape(new), ax, 0)

    xs = (split(cols, 0, 0), split(counts, 0, 1)) + tuple(
        split(a, ax, 0) for a, ax in row_ops
    )

    def body(_, inp):
        return None, launch(inp[0], inp[1], *inp[2:])

    _, outs = lax.scan(body, None, xs)
    out = outs.reshape((-1,) + outs.shape[2:])
    return out[: nI * (out.shape[0] // nIp)]


# ==============================================================================
#  Step-list walk traversal (round 4)
# ==============================================================================
#
# The rectangular ``(nI, cap)`` traversal grid pays ~0.5-1 us of scalar-
# core bookkeeping per grid step even when the step is masked out, so the
# static ``cap`` had to hug the mean kept count — which silently clipped
# the rows above it (round-3 advisor finding: cap 64 clipped 43% of rows
# at 2M, shifting the loss ~9% at 4M). The walk flattens the kept steps
# of each row-chunk into ONE step list: grid size tracks the *total* kept
# count (mean-level budget, not per-row width), so the tables can be as
# wide as correctness wants while dead steps all but vanish.
#
# Each step packs (flag, row tile, column tile) into one int32 SMEM word:
#   fl << 26 | it << 13 | jt        (fl: 1 = first step of a row run,
#                                    0 = continuation, 2 = dead padding)
# Runs are row-major, so the output block stays resident across a run and
# accumulates in place (the triangle-walk pattern); dead padding repeats
# the chunk's last real step — same block indices, no DMA, compute
# predicated off.

#: Rows per walk chunk: bounds the packed SMEM table at
#: ``MAX_WALK_ROWS * t_mean`` int32 words per launch (~1 MB budget).
MAX_WALK_ROWS = 1024


def walk_plan(cols, counts, t_mean):
    """Pack a ``(cols, counts)`` table into per-chunk step lists.

    Args:
        cols: ``(nI, cap)`` int32 kept-tile table (row-sorted by score).
        counts: ``(nI,)`` kept counts (>= 1).
        t_mean: static per-row step budget. A chunk whose total kept count
            exceeds ``MAX_WALK_ROWS * t_mean`` clips every row
            proportionally (keeping each row's best-scoring tiles) — a
            mean-level budget instead of the rectangular per-row cap.

    Returns:
        ``(nc, T_c)`` int32 packed step table (see module comment).
    """
    nI, cap = cols.shape
    rows_c = min(nI, MAX_WALK_ROWS)
    nc = -(-nI // rows_c)
    nIp = nc * rows_c
    if nIp != nI:
        cols = jnp.pad(cols, ((0, nIp - nI), (0, 0)))
        counts = jnp.pad(counts, (0, nIp - nI), constant_values=1)
    T_c = rows_c * t_mean

    cnt = counts.reshape(nc, rows_c).astype(jnp.int32)
    colc = cols.reshape(nc, rows_c, cap).astype(jnp.int32)
    tot = cnt.sum(axis=1)  # (nc,)
    # Proportional per-row clip on overflow (each row keeps >= 1):
    scale = (T_c - rows_c) / jnp.maximum(tot - rows_c, 1).astype(jnp.float32)
    clipped = 1 + ((cnt - 1) * jnp.minimum(scale, 1.0)[:, None]).astype(
        jnp.int32
    )
    cnt = jnp.where(tot[:, None] > T_c, clipped, cnt)
    cnt = jnp.minimum(cnt, cap)

    # Gather-based construction (a scattered .at[tgt].set over the slots
    # measured 27 ms at 2M — TPU scatters are slow; the only scatter left
    # is the nI-element run-start indicator):
    offs = jnp.cumsum(cnt, axis=1) - cnt  # exclusive, per chunk
    ind = (
        jnp.zeros((nc, T_c), jnp.int32)
        .at[jnp.arange(nc)[:, None], offs]
        .add(1, mode="drop")
    )
    row = jnp.cumsum(ind, axis=1) - 1  # slot -> local row (clamps at end)
    slot = jnp.arange(T_c, dtype=jnp.int32)[None, :]
    k = slot - jnp.take_along_axis(offs, row, axis=1)
    cnt_r = jnp.take_along_axis(cnt, row, axis=1)
    dead = k >= cnt_r  # covers slot >= tot too (row clamps to rows_c - 1)
    kc = jnp.minimum(k, cnt_r - 1)  # dead slots repeat the last real step
    jt = jnp.take_along_axis(
        colc.reshape(nc, rows_c * cap),
        row * cap + kc,
        axis=1,
    )
    fl = jnp.where(dead, 2, jnp.where(k == 0, 1, 0))
    return (fl << 26) | (row << 13) | jt


def _walk_split_rows(a, ax, nI, nc, rows_c, fill=0.0):
    """Split a row-indexed operand into walk chunks along a new axis 0."""
    nIp = nc * rows_c
    k = a.shape[ax] // nI
    if nIp != nI:
        pad = [(0, 0)] * a.ndim
        pad[ax] = (0, (nIp - nI) * k)
        a = jnp.pad(a, pad, constant_values=fill)
    sh = a.shape
    new = sh[:ax] + (nc, rows_c * k) + sh[ax + 1:]
    return jnp.moveaxis(a.reshape(new), ax, 0)


def _launch_walk(launch, nI, tbl, row_ops):
    """Run a walk kernel over its chunks (one compiled kernel, scanned).

    ``launch(tbl_c, *row_op_chunks) -> (rows_c * block, C)``;
    ``row_ops`` is a list of ``(array, chunk_axis, fill)``.
    """
    nc, T_c = tbl.shape
    rows_c = min(nI, MAX_WALK_ROWS)
    if nc == 1:
        return launch(tbl[0], *[a for a, _, _ in row_ops])

    xs = (tbl,) + tuple(
        _walk_split_rows(a, ax, nI, nc, rows_c, fill)
        for a, ax, fill in row_ops
    )

    def body(_, inp):
        return None, launch(inp[0], *inp[1:])

    _, outs = lax.scan(body, None, xs)
    out = outs.reshape((-1,) + outs.shape[2:])
    return out[: nI * (out.shape[0] // (nc * rows_c))]


def _row_sum_walk_kernel(
    tbl_ref, eps_ref, xhT_ref, yhT_ref, phi_ref, psi_ref, *rest, p,
):
    # p=2 folds the quadratics into the biases, so the sq operands (and
    # their per-step index-map evaluations + DMAs) are only wired for p=1.
    if p == 2:
        (o_ref,) = rest
    else:
        sqx_ref, sqy_ref, o_ref = rest
    t = pl.program_id(1)
    fl = tbl_ref[t] >> 26

    def _row():
        c2 = LOG2E / eps_ref[0]
        scores = _scores_dot(xhT_ref[:], yhT_ref[:])
        if p == 2:
            W = jnp.exp2(phi_ref[:] + (psi_ref[:] + scores * c2))
        else:
            sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
            d = jnp.where(sq > 2e-6 * (sqx_ref[:] + sqy_ref[:]),
                          jnp.sqrt(jnp.maximum(sq, 1e-8)), 0.0)
            W = jnp.exp2(phi_ref[:] + (psi_ref[:] - d * c2))
        return jnp.sum(W, axis=1, keepdims=True)

    @pl.when(fl == 1)
    def _first():
        o_ref[:] = _row()

    @pl.when(fl == 0)
    def _cont():
        o_ref[:] += _row()


@functools.partial(jax.jit, static_argnames=("p", "block"))
def _absorbed_sum_walk(x, y, phi, psi, eps, tbl, p, block):
    """Step-list variant of :func:`_absorbed_sum` (same math, same
    operand folding; traversal driven by a :func:`walk_plan` table)."""
    N, D = x.shape
    M, _ = y.shape
    assert N % block == 0 and M % block == 0
    bn = min(block, max(128, (1024 * 2048) // block))
    s = block // bn

    f32 = jnp.float32
    x32, y32 = x.astype(f32), y.astype(f32)
    eps32 = jnp.asarray(eps, f32)
    if p == 2:
        phi_eff = (phi.astype(f32) - 0.5 * (x32**2).sum(-1) / eps32) * LOG2E
        psi_eff = (psi.astype(f32) - 0.5 * (y32**2).sum(-1) / eps32) * LOG2E
    else:
        phi_eff = phi.astype(f32) * LOG2E
        psi_eff = psi.astype(f32) * LOG2E

    xhT, yhT = _split6_pair(x32.T, y32.T)
    sqx = ((x32**2).sum(-1))[:, None]
    sqy = ((y32**2).sum(-1))[None, :]
    eps_arr = eps32.reshape(1)
    psi_row = psi_eff[None, :]
    K = xhT.shape[0]
    nI = N // block
    nc, T_c = tbl.shape
    rows_c = min(nI, MAX_WALK_ROWS)

    def _it(tbl, t):
        return (tbl[t] >> 13) & 0x1FFF

    def _jt(tbl, t):
        return tbl[t] & 0x1FFF

    def launch(tbl_c, xhT_c, phi_c, sqx_c):
        in_specs = [
            pl.BlockSpec((K, bn), lambda k, t, tb, e: (0, _it(tb, t) * s + k)),
            pl.BlockSpec((K, block), lambda k, t, tb, e: (0, _jt(tb, t))),
            pl.BlockSpec((bn, 1), lambda k, t, tb, e: (_it(tb, t) * s + k, 0)),
            pl.BlockSpec((1, block), lambda k, t, tb, e: (0, _jt(tb, t))),
        ]
        ops = [xhT_c, yhT, phi_c, psi_row]
        if p != 2:
            in_specs += [
                pl.BlockSpec((bn, 1), lambda k, t, tb, e: (_it(tb, t) * s + k, 0)),
                pl.BlockSpec((1, block), lambda k, t, tb, e: (0, _jt(tb, t))),
            ]
            ops += [sqx_c, sqy]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tbl, eps
            grid=(s, T_c),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (bn, 1), lambda k, t, tb, e: (_it(tb, t) * s + k, 0)
            ),
            scratch_shapes=[],
        )
        return pl.pallas_call(
            functools.partial(_row_sum_walk_kernel, p=p),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows_c * block, 1), f32),
            interpret=_interpret(),
        )(tbl_c, eps_arr, *ops)

    r = _launch_walk(
        launch, nI, tbl,
        [(xhT, 1, 0.0), (phi_eff[:, None], 0, NEG_INF), (sqx, 0, 0.0)],
    )
    return jnp.maximum(r[:, 0], _SUM_FLOOR)


def sinkhorn_step_walk(eps, x, y, a_log, b_log, f, g, tbl, tblT, p=2,
                       block=512, sym=False):
    """Step-list analogue of :func:`sinkhorn_step_sparse`."""
    eps32 = jnp.asarray(eps, jnp.float32)
    phi = a_log + f / eps32
    psi = b_log + g / eps32
    r = _absorbed_sum_walk(x, y, phi, psi, eps32, tbl, p, block)
    S_xy = (f + eps32 * (a_log - jnp.log(r))).astype(f.dtype)
    if sym:
        return S_xy, None
    c = _absorbed_sum_walk(y, x, psi, phi, eps32, tblT, p, block)
    S_yx = (g + eps32 * (b_log - jnp.log(c))).astype(g.dtype)
    return S_xy, S_yx


# ==============================================================================
#  Banded dual-direction walk
# ==============================================================================
#
# The asymmetric (xy) fine problems need BOTH reduction directions of the
# same kept pair set; the plain walk traverses the pairs twice (``tbl``
# row-major for the row sums, ``tblT`` for the column sums) because a
# Pallas output block only accumulates across *consecutive* grid steps —
# scattered column-tile revisits would corrupt it. The banded walk fixes
# the traversal order instead of the kernel: steps are ordered
# **band-major** (bands = aligned groups of ``BAND_TILES`` column tiles),
# so each band's (1, BAND_TILES * block) column accumulator is one output
# block visited consecutively, while the row sums accumulate into a
# single whole-chunk output block (constant index) through dynamic-slice
# read-modify-writes — the TPU grid is sequential, so in-kernel RMW on an
# output ref is race-free. One pass over the pairs then yields both
# softmin directions, like the dense absorbed step
# (``pallas_kernels.py::sinkhorn_step_pallas``), at half the traversal
# cost of the two-table walk. Each band opens with a *marker* step (dead,
# ``fl == 1``) that zeroes the band accumulator, so empty bands still
# produce defined output.
#
# Table word layout (int32): ``fl(2) << 26 | row(13) << 13 | jt(13)``
# with fl 0 = live, 1 = band marker, 2 = trailing dead (repeats the last
# real step so the pipeline issues no DMA).

#: Column tiles per accumulation band: (1, 256 * 1024) f32 = 1 MB VMEM
#: per band buffer at the production fine tile.
BAND_TILES = 256

#: Row tiles per banded launch: the whole-chunk row accumulator is a
#: (rows * block, 1) f32 output block resident for the entire launch
#: (2 MB at block = 1024), alongside the band buffer and the streamed
#: (block, block) score blocks.
MAX_BANDED_ROWS = 512


def walk_plan_banded(cols, counts, t_mean, n_col_tiles,
                     band_tiles=BAND_TILES, tri=False, rows_chunk=None,
                     row_offset=0):
    """Pack a ``(cols, counts)`` table into band-major step lists.

    Args:
        cols: ``(nI, cap)`` int32 kept-tile table (row-sorted by score).
        counts: ``(nI,)`` kept counts (>= 0).
        t_mean: static per-row step budget; a chunk whose total kept
            count exceeds ``rows_c * t_mean`` clips every row
            proportionally (keeping each row's best-scoring tiles).
        n_col_tiles: static column-tile count of the traversed operand.
        tri: symmetric-problem triangle mode — keep only tiles with
            ``col >= row`` (the kernel's column outputs then supply the
            mirrored lower-triangle contributions at half the pair
            visits); diagonal tiles get the no-column bit (28) so their
            intra-tile pairs are not double counted.
        row_offset: global tile index of row 0 — triangle comparisons
            use ``row_offset + i`` so a row-sharded slice of a symmetric
            problem (``parallel/multiscale_sharded.py``) plans the same
            global triangle as the unsharded table. May be traced.

    Returns:
        ``(nc, T_c)`` int32 packed step table, steps ordered by
        ``(band, row, column)`` with one leading marker per band.
    """
    nI, cap = cols.shape
    assert n_col_tiles <= 8192 and nI <= 8192, "13-bit table fields"
    # Multiple of 8: the kernel's row accumulator addresses 8-aligned
    # sublane groups. Tables for the dual APPLY kernel must be chunked
    # at its (smaller) MAX_APPLY_ROWS — pass rows_chunk accordingly.
    if rows_chunk is None:
        rows_chunk = MAX_BANDED_ROWS
    rows_c = min(_cdiv(nI, 8) * 8, max(8, rows_chunk))
    nc = _cdiv(nI, rows_c)
    nIp = nc * rows_c
    nb = _cdiv(n_col_tiles, band_tiles)
    if nIp != nI:
        cols = jnp.pad(cols, ((0, nIp - nI), (0, 0)))
        counts = jnp.pad(counts, (0, nIp - nI))
    budget = rows_c * t_mean
    T_c = budget + nb

    if tri:
        # Compress each row's upper-triangle entries to the front,
        # preserving the score order (key packs (rank, col)):
        gr = row_offset + jnp.arange(nIp, dtype=jnp.int32)
        k0 = jnp.arange(cap, dtype=jnp.int32)
        ok = (k0[None, :] < counts[:, None]) & (cols >= gr[:, None])
        key = jnp.where(ok, (k0[None, :] << 13) | cols, jnp.int32(1 << 28))
        key = jnp.sort(key, axis=-1)
        cols = key & 0x1FFF
        counts = ok.sum(axis=1).astype(jnp.int32)

    cnt = counts.reshape(nc, rows_c).astype(jnp.int32)
    colc = cols.reshape(nc, rows_c, cap).astype(jnp.int32)
    tot = cnt.sum(axis=1)
    # Proportional per-row clip on overflow; every live row keeps at
    # least its best-scoring tile (losing all neighbors would floor the
    # row's softmin to _SUM_FLOOR):
    n_live = (cnt > 0).sum(axis=1)
    scale = (budget - n_live) / jnp.maximum(tot - n_live, 1).astype(
        jnp.float32
    )
    clipped = jnp.where(
        cnt > 0,
        1 + ((cnt - 1) * jnp.minimum(scale, 1.0)[:, None]).astype(
            jnp.int32
        ),
        0,
    )
    cnt = jnp.where(tot[:, None] > budget, clipped, cnt)

    # Keep each row's best-score prefix, then order it by column index so
    # same-band entries are contiguous (SENT sorts invalid slots last):
    SENT = jnp.int32(1 << 24)
    k_idx = jnp.arange(cap, dtype=jnp.int32)
    colv = jnp.where(k_idx[None, None, :] < cnt[..., None], colc, SENT)
    colv = jnp.sort(colv, axis=-1)
    band = jnp.minimum(colv // band_tiles, nb)  # nb == invalid sentinel

    b_idx = jnp.arange(nb, dtype=jnp.int32)
    hb = (band[..., None] == b_idx).sum(axis=2).astype(jnp.int32)
    row_pre = jnp.cumsum(hb, axis=2) - hb  # earlier bands, same row
    hbT = jnp.moveaxis(hb, 1, 2)  # (nc, nb, rows_c)
    row_cum = jnp.cumsum(hbT, axis=2)  # inclusive over rows, per band
    tb = row_cum[:, :, -1]  # (nc, nb) per-band totals
    band_start = jnp.cumsum(tb + 1, axis=1) - (tb + 1)  # marker included
    used = band_start[:, -1] + tb[:, -1] + 1

    t_idx = jnp.arange(T_c, dtype=jnp.int32)
    chunk_base = row_offset + jnp.arange(nc, dtype=jnp.int32) * rows_c

    def per_chunk(band_start_c, tb_c, row_cum_c, hbT_c, row_pre_c, colv_c,
                  used_c, base_c):
        b = (
            jnp.searchsorted(band_start_c, t_idx, side="right").astype(
                jnp.int32
            )
            - 1
        )
        b = jnp.clip(b, 0, nb - 1)
        bs = band_start_c[b]
        marker = t_idx == bs
        q = t_idx - bs - 1  # entry rank within the band
        r_all = jax.vmap(
            lambda a: jnp.searchsorted(a, q, side="right")
        )(row_cum_c).astype(jnp.int32)  # (nb, T_c)
        r = jnp.take_along_axis(r_all, b[None, :], axis=0)[0]
        r = jnp.clip(r, 0, rows_c - 1)
        row_excl = row_cum_c[b, r] - hbT_c[b, r]
        k = jnp.clip(q - row_excl + row_pre_c[r, b], 0, cap - 1)
        jt = colv_c[r, jnp.clip(k, 0, cap - 1)]
        jt = jnp.where(marker, b * band_tiles, jt)
        r = jnp.where(marker, 0, r)
        # fl 3 marks a band's LAST live step: the kernel flushes its
        # band accumulator (VMEM scratch) into the output block there.
        nxt_marker = jnp.roll(marker, -1).at[-1].set(True)
        last_live = (~marker) & (nxt_marker | (t_idx == used_c - 1))
        fl = jnp.where(marker, 1, jnp.where(last_live, 3, 0)).astype(
            jnp.int32
        )
        word = (fl << 26) | (r << 13) | jt
        if tri:
            # Diagonal tiles contribute only through the row direction:
            nocol = (~marker) & (jt == base_c + r)
            word = word | (nocol.astype(jnp.int32) << 28)
        # Trailing dead slots repeat the last real step (fl = 2):
        last = word[jnp.maximum(used_c - 1, 0)]
        dead_word = (jnp.int32(2) << 26) | (last & ((1 << 26) - 1))
        return jnp.where(t_idx < used_c, word, dead_word)

    return jax.vmap(per_chunk)(
        band_start, tb, row_cum, hbT, row_pre, colv, used, chunk_base
    )


def _pair_walk_banded_kernel(
    tbl_ref, eps_ref, xhT_ref, yhT_ref, phi_ref, psi_ref, *rest, p, block,
    band_tiles,
):
    if p == 2:
        orow_ref, ocol_ref, cacc_ref = rest
    else:
        sqx_ref, sqy_ref, orow_ref, ocol_ref, cacc_ref = rest
    t = pl.program_id(0)
    w = tbl_ref[t]
    fl = (w >> 26) & 3
    nocol = (w >> 28) & 1  # triangle diagonal: skip the column direction
    it = (w >> 13) & 0x1FFF
    jt = w & 0x1FFF

    @pl.when(t == 0)
    def _init_rows():
        orow_ref[:] = jnp.zeros_like(orow_ref)

    @pl.when(fl == 1)
    def _init_band():
        # Zero the band accumulator (VMEM scratch) AND the output block:
        # an empty band's block is otherwise written back undefined.
        cacc_ref[:] = jnp.zeros_like(cacc_ref)
        ocol_ref[:] = jnp.zeros_like(ocol_ref)

    @pl.when((fl == 0) | (fl == 3))
    def _live():
        c2 = LOG2E / eps_ref[0]
        scores = _scores_dot(xhT_ref[:], yhT_ref[:])
        if p == 2:
            W = jnp.exp2(phi_ref[:] + (psi_ref[:] + scores * c2))
        else:
            sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
            d = jnp.where(sq > 2e-6 * (sqx_ref[:] + sqy_ref[:]),
                          jnp.sqrt(jnp.maximum(sq, 1e-8)), 0.0)
            W = jnp.exp2(phi_ref[:] + (psi_ref[:] - d * c2))
        rs = jnp.sum(W, axis=1, keepdims=True)  # (block, 1)
        cs = jnp.sum(W, axis=0, keepdims=True)  # (1, block)
        # Row accumulator row `it` of the (rows_c, block) output block
        # (constant index, single buffer — in-place accumulation is
        # safe there): dynamic sublane slices must be 8-aligned, so
        # address the enclosing 8-row group and select the target
        # sublane with an iota mask:
        base = (it // 8) * 8
        sel = (
            lax.broadcasted_iota(jnp.int32, (8, block), 0) == it - base
        )
        rs8 = jnp.where(sel, rs.reshape(1, block), 0.0)
        roff = pl.ds(base, 8)
        orow_ref[roff, :] = orow_ref[roff, :] + rs8
        # Column sums accumulate in the scratch (the banded OUTPUT block
        # switches buffers at band boundaries, so reads from it are not
        # reliable); fl == 3 flushes the finished band below.
        cs = jnp.where(nocol == 0, cs, jnp.zeros_like(cs))
        joff = pl.ds((jt % band_tiles) * block, block)
        cacc_ref[:, joff] = cacc_ref[:, joff] + cs

    @pl.when(fl == 3)
    def _flush_band():
        ocol_ref[:] = cacc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("p", "block", "band_tiles", "rows_chunk")
)
def _absorbed_sum_walk_banded(x, y, phi, psi, eps, tbl, p, block,
                              band_tiles=BAND_TILES, rows_chunk=None):
    """One banded pass over the kept pairs: absorbed row AND column sums.

    Same math and operand folding as :func:`_absorbed_sum_walk`, but the
    band-major traversal of a :func:`walk_plan_banded` table accumulates
    both reduction directions in a single visit of each pair block.

    ``band_tiles`` and ``rows_chunk`` MUST match the values the table was
    planned with (:func:`walk_plan_banded`): the packed words carry no
    band tag, so a mismatched band width silently corrupts the column
    sums. The chunk-count assert below catches ``rows_chunk`` mismatches;
    band widths are the caller's contract.
    """
    N, D = x.shape
    M, _ = y.shape
    assert N % block == 0 and M % block == 0
    # The whole-chunk row accumulator forces one row tile per grid step
    # (no sub-blocking): a (block, block) f32 scores block must fit VMEM
    # next to the row accumulator and two band buffers, which caps the
    # tile at 1024 ((2048, 2048) f32 alone is ~16.8 MB > the ~16 MB
    # budget). Larger tiles take the two-pass walk (callers gate on it).
    if block > 1024:
        raise NotImplementedError(
            f"banded walk supports block <= 1024 (got {block}); use the "
            "two-pass sinkhorn_step_walk for larger tiles"
        )

    f32 = jnp.float32
    x32, y32 = x.astype(f32), y.astype(f32)
    eps32 = jnp.asarray(eps, f32)
    if p == 2:
        phi_eff = (phi.astype(f32) - 0.5 * (x32**2).sum(-1) / eps32) * LOG2E
        psi_eff = (psi.astype(f32) - 0.5 * (y32**2).sum(-1) / eps32) * LOG2E
    else:
        phi_eff = phi.astype(f32) * LOG2E
        psi_eff = psi.astype(f32) * LOG2E

    xhT, yhT = _split6_pair(x32.T, y32.T)
    sqx = ((x32**2).sum(-1))[:, None]
    sqy = ((y32**2).sum(-1))[None, :]
    eps_arr = eps32.reshape(1)
    psi_row = psi_eff[None, :]
    K = xhT.shape[0]
    nI, nJ = N // block, M // block
    nc, T_c = tbl.shape
    if rows_chunk is None:
        rows_chunk = MAX_BANDED_ROWS
    rows_c = min(_cdiv(nI, 8) * 8, max(8, rows_chunk))
    assert nc == _cdiv(nI, rows_c), (
        f"table chunking mismatch: {nc} chunks for {nI} row tiles at "
        f"rows_chunk={rows_chunk} — pass the rows_chunk the plan was "
        "built with (walk_plan_banded rows_chunk=...)"
    )
    nb = _cdiv(nJ, band_tiles)
    Mb = nb * band_tiles * block  # column output padded to whole bands

    def _it(tbl, t):
        return (tbl[t] >> 13) & 0x1FFF

    def _jt(tbl, t):
        return tbl[t] & 0x1FFF

    def _bd(tbl, t):
        return (tbl[t] & 0x1FFF) // band_tiles

    def launch(tbl_c, xhT_c, phi_c, sqx_c):
        in_specs = [
            pl.BlockSpec((K, block), lambda t, tb, e: (0, _it(tb, t))),
            pl.BlockSpec((K, block), lambda t, tb, e: (0, _jt(tb, t))),
            pl.BlockSpec((block, 1), lambda t, tb, e: (_it(tb, t), 0)),
            pl.BlockSpec((1, block), lambda t, tb, e: (0, _jt(tb, t))),
        ]
        ops = [xhT_c, yhT, phi_c[:, None], psi_row]
        if p != 2:
            in_specs += [
                pl.BlockSpec((block, 1), lambda t, tb, e: (_it(tb, t), 0)),
                pl.BlockSpec((1, block), lambda t, tb, e: (0, _jt(tb, t))),
            ]
            ops += [sqx_c, sqy]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tbl, eps
            grid=(T_c,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(
                    (rows_c, block), lambda t, tb, e: (0, 0)
                ),
                pl.BlockSpec(
                    (1, band_tiles * block), lambda t, tb, e: (0, _bd(tb, t))
                ),
            ],
            scratch_shapes=[pltpu.VMEM((1, band_tiles * block), f32)],
        )
        return pl.pallas_call(
            functools.partial(
                _pair_walk_banded_kernel, p=p, block=block,
                band_tiles=band_tiles,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((rows_c, block), f32),
                jax.ShapeDtypeStruct((1, Mb), f32),
            ],
            interpret=_interpret(),
        )(tbl_c, eps_arr, *ops)

    row_ops = [(xhT, 1, 0.0), (phi_eff, 0, NEG_INF), (sqx, 0, 0.0)]
    if nc == 1:
        orow, ocol = launch(tbl[0], *[a for a, _, _ in row_ops])
        ocol = ocol[0]
    else:
        xs = (tbl,) + tuple(
            _walk_split_rows(a, ax, nI, nc, rows_c, fill)
            for a, ax, fill in row_ops
        )

        def body(_, inp):
            return None, launch(inp[0], *inp[1:])

        _, (orows, ocols) = lax.scan(body, None, xs)
        orow = orows.reshape(-1, block)
        ocol = ocols[:, 0, :].sum(axis=0)
    r = jnp.maximum(orow.reshape(-1)[:N], _SUM_FLOOR)
    c = jnp.maximum(ocol[:M], _SUM_FLOOR)
    return r, c


#: Column tiles per band of the dual gradient apply: its (C, band) and
#: (C * rows, block) accumulators are larger than the step kernel's, so
#: bands and row chunks shrink to fit VMEM.
APPLY_BAND_TILES = 64
MAX_APPLY_ROWS = 256


def _apply_walk_banded_kernel(
    tbl_ref, eps_ref, xhT_ref, yhT_ref, phi_ref, psi_ref, vyT_ref, vx_ref,
    *rest, p, kind, block, band_tiles, C, rows_c,
):
    if p == 2:
        orow_ref, ocol_ref, cacc_ref = rest
    else:
        sqx_ref, sqy_ref, orow_ref, ocol_ref, cacc_ref = rest
    t = pl.program_id(0)
    w_t = tbl_ref[t]
    fl = (w_t >> 26) & 3
    nocol = (w_t >> 28) & 1
    it = (w_t >> 13) & 0x1FFF
    jt = w_t & 0x1FFF

    @pl.when(t == 0)
    def _init_rows():
        orow_ref[:] = jnp.zeros_like(orow_ref)

    @pl.when(fl == 1)
    def _init_band():
        cacc_ref[:] = jnp.zeros_like(cacc_ref)
        ocol_ref[:] = jnp.zeros_like(ocol_ref)

    @pl.when((fl == 0) | (fl == 3))
    def _live():
        c2 = LOG2E / eps_ref[0]
        scores = _scores_dot(xhT_ref[:], yhT_ref[:])
        if p == 2:
            w = jnp.exp2(phi_ref[:] + (psi_ref[:] + scores * c2))
        else:
            sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
            d = jnp.sqrt(jnp.maximum(sq, 1e-8))
            dw = jnp.where(sq > 2e-6 * (sqx_ref[:] + sqy_ref[:]), d, 0.0)
            w = jnp.exp2(phi_ref[:] + (psi_ref[:] - dw * c2))
            if kind == "gibbs_grad":
                w = jnp.where(sq > 1e-6, w / d, 0.0)
        # Row direction (exact f32 per-channel VPU reductions): channel c
        # lands in sublane group [c * rows_c + it] of the constant-index
        # output block.
        base = (it // 8) * 8
        sel = (
            lax.broadcasted_iota(jnp.int32, (8, block), 0) == it - base
        )
        for c in range(C):
            rc = jnp.sum(w * vyT_ref[c : c + 1, :], axis=1, keepdims=True)
            rs8 = jnp.where(sel, rc.reshape(1, block), 0.0)
            roff = pl.ds(c * rows_c + base, 8)
            orow_ref[roff, :] = orow_ref[roff, :] + rs8
        # Column direction: (C, block) stack into the band SCRATCH
        # (see _pair_walk_banded_kernel), band-local lane offset.
        cstack = jnp.concatenate(
            [
                jnp.sum(w * vx_ref[:, c : c + 1], axis=0, keepdims=True)
                for c in range(C)
            ],
            axis=0,
        )
        cstack = jnp.where(nocol == 0, cstack, jnp.zeros_like(cstack))
        joff = pl.ds((jt % band_tiles) * block, block)
        cacc_ref[:, joff] = cacc_ref[:, joff] + cstack

    @pl.when(fl == 3)
    def _flush_band():
        ocol_ref[:] = cacc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("p", "kind", "block", "band_tiles", "rows_chunk"),
)
def gibbs_apply_walk_banded(
    x, y, phi, psi, Vy, Vx, eps, tbl, p=2, kind="gibbs", block=512,
    band_tiles=None, rows_chunk=None,
):
    """Dual-direction banded gradient apply: ONE pass over the kept pairs
    returns both ``R_row[i] = sum_j w_ij Vy[j]`` and
    ``R_col[j] = sum_i w_ij Vx[i]`` of the *raw* absorbed weights (no
    per-row/-column normalization folded in — callers divide by the
    forward row/column sums), halving the traversals of the two
    :func:`gibbs_apply_walk` calls in the extrapolation backward.

    ``band_tiles``/``rows_chunk`` must match the plan (see
    :func:`_absorbed_sum_walk_banded`); defaults resolve to the module
    constants :data:`APPLY_BAND_TILES` / :data:`MAX_APPLY_ROWS` at call
    time."""
    if band_tiles is None:
        band_tiles = APPLY_BAND_TILES
    N, D = x.shape
    M, _ = y.shape
    C = Vy.shape[-1]
    assert Vx.shape[-1] == C
    assert N % block == 0 and M % block == 0
    if block > 1024:
        raise NotImplementedError(
            f"banded apply supports block <= 1024 (got {block}); use "
            "gibbs_apply_walk for larger tiles"
        )

    f32 = jnp.float32
    x32, y32 = x.astype(f32), y.astype(f32)
    eps32 = jnp.asarray(eps, f32)
    if p == 2:
        phi_eff = (phi.astype(f32) - 0.5 * (x32**2).sum(-1) / eps32) * LOG2E
        psi_eff = (psi.astype(f32) - 0.5 * (y32**2).sum(-1) / eps32) * LOG2E
    else:
        phi_eff = phi.astype(f32) * LOG2E
        psi_eff = psi.astype(f32) * LOG2E

    xhT, yhT = _split6_pair(x32.T, y32.T)
    psi_row = psi_eff[None, :]
    sqx = ((x32**2).sum(-1))[:, None]
    sqy = ((y32**2).sum(-1))[None, :]
    vyT = Vy.astype(f32).T  # (C, M)
    vx = Vx.astype(f32)  # (N, C)
    eps_arr = eps32.reshape(1)
    K = xhT.shape[0]
    nI, nJ = N // block, M // block
    nc, T_c = tbl.shape
    if rows_chunk is None:
        rows_chunk = MAX_APPLY_ROWS
    rows_c = min(_cdiv(nI, 8) * 8, max(8, rows_chunk))
    assert nc == _cdiv(nI, rows_c), (
        f"table chunking mismatch: {nc} chunks for {nI} row tiles at "
        f"rows_chunk={rows_chunk} — pass the rows_chunk the plan was "
        "built with (walk_plan_banded rows_chunk=...)"
    )
    nb = _cdiv(nJ, band_tiles)
    Mb = nb * band_tiles * block

    def _it(tb, t):
        return (tb[t] >> 13) & 0x1FFF

    def _jt(tb, t):
        return tb[t] & 0x1FFF

    def _bd(tb, t):
        return (tb[t] & 0x1FFF) // band_tiles

    def launch(tbl_c, xhT_c, phi_c, vx_c, sqx_c):
        in_specs = [
            pl.BlockSpec((K, block), lambda t, tb, e: (0, _it(tb, t))),
            pl.BlockSpec((K, block), lambda t, tb, e: (0, _jt(tb, t))),
            pl.BlockSpec((block, 1), lambda t, tb, e: (_it(tb, t), 0)),
            pl.BlockSpec((1, block), lambda t, tb, e: (0, _jt(tb, t))),
            pl.BlockSpec((C, block), lambda t, tb, e: (0, _jt(tb, t))),
            pl.BlockSpec((block, C), lambda t, tb, e: (_it(tb, t), 0)),
        ]
        ops = [xhT_c, yhT, phi_c[:, None], psi_row, vyT, vx_c]
        if p != 2:
            in_specs += [
                pl.BlockSpec((block, 1), lambda t, tb, e: (_it(tb, t), 0)),
                pl.BlockSpec((1, block), lambda t, tb, e: (0, _jt(tb, t))),
            ]
            ops += [sqx_c, sqy]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T_c,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((C * rows_c, block), lambda t, tb, e: (0, 0)),
                pl.BlockSpec(
                    (C, band_tiles * block), lambda t, tb, e: (0, _bd(tb, t))
                ),
            ],
            scratch_shapes=[pltpu.VMEM((C, band_tiles * block), f32)],
        )
        return pl.pallas_call(
            functools.partial(
                _apply_walk_banded_kernel, p=p, kind=kind, block=block,
                band_tiles=band_tiles, C=C, rows_c=rows_c,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((C * rows_c, block), f32),
                jax.ShapeDtypeStruct((C, Mb), f32),
            ],
            interpret=_interpret(),
        )(tbl_c, eps_arr, *ops)

    row_ops = [
        (xhT, 1, 0.0), (phi_eff, 0, NEG_INF), (vx, 0, 0.0), (sqx, 0, 0.0)
    ]
    if nc == 1:
        orow, ocol = launch(tbl[0], *[a for a, _, _ in row_ops])
        orows = orow[None]
    else:
        xs = (tbl,) + tuple(
            _walk_split_rows(a, ax, nI, nc, rows_c, fill)
            for a, ax, fill in row_ops
        )

        def body(_, inp):
            return None, launch(inp[0], *inp[1:])

        _, (orows, ocols) = lax.scan(body, None, xs)
        ocol = ocols.sum(axis=0)
    # (nc, C * rows_c, block) -> (N, C):
    R_row = (
        orows.reshape(nc, C, rows_c * block)
        .transpose(0, 2, 1)
        .reshape(nc * rows_c * block, C)[:N]
    )
    R_col = ocol[:, :M].T  # (M, C)
    return R_row, R_col


def sinkhorn_step_walk_banded(eps, x, y, a_log, b_log, f, g, tbl, p=2,
                              block=512, band_tiles=BAND_TILES,
                              rows_chunk=None):
    """Single-pass banded analogue of :func:`sinkhorn_step_walk`: both
    softmin directions from one traversal of the kept pairs."""
    eps32 = jnp.asarray(eps, jnp.float32)
    phi = a_log + f / eps32
    psi = b_log + g / eps32
    r, c = _absorbed_sum_walk_banded(
        x, y, phi, psi, eps32, tbl, p, block, band_tiles, rows_chunk
    )
    S_xy = (f + eps32 * (a_log - jnp.log(r))).astype(f.dtype)
    S_yx = (g + eps32 * (b_log - jnp.log(c))).astype(g.dtype)
    return S_xy, S_yx


def sinkhorn_step_walk_banded_sym(eps, x, a_log, f, tbl, p=2, block=512,
                                  band_tiles=BAND_TILES, rows_chunk=None):
    """Symmetric absorbed step over a TRIANGLE banded table
    (``walk_plan_banded(..., tri=True)``): the row direction covers the
    kept ``col >= row`` tiles and the column direction supplies the
    mirrored lower-triangle contributions (W is symmetric), so the full
    softmin costs half the pair visits of :func:`sinkhorn_step_walk`'s
    ``sym=True`` traversal."""
    eps32 = jnp.asarray(eps, jnp.float32)
    phi = a_log + f / eps32
    r, c = _absorbed_sum_walk_banded(
        x, x, phi, phi, eps32, tbl, p, block, band_tiles, rows_chunk
    )
    s = jnp.maximum(r + c, _SUM_FLOOR)
    return (f + eps32 * (a_log - jnp.log(s))).astype(f.dtype)


def _lse_walk_kernel(
    tbl_ref, eps_ref, xhT_ref, yhT_ref, h_ref, *rest, p,
):
    if p == 2:
        o_ref, m_ref, s_ref = rest
    else:
        sqx_ref, sqy_ref, o_ref, m_ref, s_ref = rest
    t = pl.program_id(1)
    fl = tbl_ref[t] >> 26

    def _arg():
        c2 = LOG2E / eps_ref[0]
        scores = _scores_dot(xhT_ref[:], yhT_ref[:])
        if p == 2:
            return h_ref[:] + scores * c2
        sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
        d = jnp.where(sq > 2e-6 * (sqx_ref[:] + sqy_ref[:]),
                      jnp.sqrt(jnp.maximum(sq, 1e-8)), 0.0)
        return h_ref[:] - d * c2

    @pl.when(fl == 1)
    def _first():
        arg = _arg()
        m = jnp.max(arg, axis=1, keepdims=True)
        m_ref[:] = m
        s_ref[:] = jnp.sum(jnp.exp2(arg - m), axis=1, keepdims=True)
        o_ref[:] = m + jnp.log2(s_ref[:])

    @pl.when(fl == 0)
    def _cont():
        arg = _arg()
        m_prev = m_ref[:]
        blk = jnp.max(arg, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, blk)
        s_ref[:] = s_ref[:] * jnp.exp2(m_prev - m_new) + jnp.sum(
            jnp.exp2(arg - m_new), axis=1, keepdims=True
        )
        m_ref[:] = m_new
        # The run's final value persists: the block stays resident until
        # the row changes, and dead steps never touch it.
        o_ref[:] = m_new + jnp.log2(s_ref[:])


@functools.partial(jax.jit, static_argnames=("p", "block_n", "block_m"))
def lse_walk(x, y, h, eps, tbl, p=2, block_n=256, block_m=512):
    """Step-list variant of :func:`lse_sparse` (two-pass online LSE over
    the kept tiles of a :func:`walk_plan` table)."""
    N, D = x.shape
    M, _ = y.shape
    assert N % block_n == 0 and M % block_m == 0

    f32 = jnp.float32
    eps32 = jnp.asarray(eps, f32)
    x32, y32 = x.astype(f32), y.astype(f32)
    xhT, yhT = _split6_pair(x32.T, y32.T)
    h2 = h.astype(f32) * LOG2E
    if p == 2:
        h2 = h2 - (0.5 * LOG2E / eps32) * (y32**2).sum(-1)
    h2 = h2[None, :]
    sqx = ((x32**2).sum(-1))[:, None]
    sqy = ((y32**2).sum(-1))[None, :]
    eps_arr = eps32.reshape(1)

    bn = min(block_n, max(128, (1024 * 2048) // block_m))
    s = block_n // bn
    K = xhT.shape[0]
    nI = N // block_n
    nc, T_c = tbl.shape
    rows_c = min(nI, MAX_WALK_ROWS)

    def _it(tb, t):
        return (tb[t] >> 13) & 0x1FFF

    def _jt(tb, t):
        return tb[t] & 0x1FFF

    def launch(tbl_c, xhT_c, sqx_c):
        in_specs = [
            pl.BlockSpec((K, bn), lambda k, t, tb, e: (0, _it(tb, t) * s + k)),
            pl.BlockSpec((K, block_m), lambda k, t, tb, e: (0, _jt(tb, t))),
            pl.BlockSpec((1, block_m), lambda k, t, tb, e: (0, _jt(tb, t))),
        ]
        ops = [xhT_c, yhT, h2]
        if p != 2:
            in_specs += [
                pl.BlockSpec((bn, 1), lambda k, t, tb, e: (_it(tb, t) * s + k, 0)),
                pl.BlockSpec((1, block_m), lambda k, t, tb, e: (0, _jt(tb, t))),
            ]
            ops += [sqx_c, sqy]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(s, T_c),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (bn, 1), lambda k, t, tb, e: (_it(tb, t) * s + k, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((bn, 1), f32),
                pltpu.VMEM((bn, 1), f32),
            ],
        )
        return pl.pallas_call(
            functools.partial(_lse_walk_kernel, p=p),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows_c * block_n, 1), f32),
            interpret=_interpret(),
        )(tbl_c, eps_arr, *ops)

    out = _launch_walk(launch, nI, tbl, [(xhT, 1, 0.0), (sqx, 0, 0.0)])
    out = out[:, 0] * LN2
    if p == 2:
        out = out - 0.5 * (x32**2).sum(-1) / eps32
    return out


def _apply_walk_kernel(
    tbl_ref, eps_ref, xhT_ref, yhT_ref, phi_ref, psi_ref, *rest, p, kind, mxu,
):
    if p == 2 and kind not in ("energy", "inv_dist"):
        VT_ref, o_ref = rest
    else:
        sqx_ref, sqy_ref, VT_ref, o_ref = rest
    t = pl.program_id(1)
    fl = tbl_ref[t] >> 26

    def _contrib():
        c2 = LOG2E / eps_ref[0]
        scores = _scores_dot(xhT_ref[:], yhT_ref[:])
        if p == 2 and kind not in ("energy", "inv_dist"):
            w = jnp.exp2(phi_ref[:] + (psi_ref[:] + scores * c2))
        else:
            sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
            d = jnp.sqrt(jnp.maximum(sq, 1e-8))
            if kind == "energy":
                w = -d
            elif kind == "inv_dist":
                w = jnp.where(sq > 1e-6, 1.0 / d, 0.0)
            else:
                dw = jnp.where(sq > 2e-6 * (sqx_ref[:] + sqy_ref[:]), d, 0.0)
                w = jnp.exp2(phi_ref[:] + (psi_ref[:] - dw * c2))
                if kind == "gibbs_grad":
                    w = jnp.where(sq > 1e-6, w / d, 0.0)
        if not mxu:
            # Exact-f32 per-channel VPU reductions (see _vpu_channels):
            return _vpu_channels(w, VT_ref[:])
        return _vt_dot_w(VT_ref[:], w)

    @pl.when(fl == 1)
    def _first():
        o_ref[:] = _contrib()

    @pl.when(fl == 0)
    def _cont():
        o_ref[:] += _contrib()


@functools.partial(jax.jit, static_argnames=("p", "kind", "block_n", "block_m"))
def gibbs_apply_walk(
    x, y, phi, psi, V, eps, tbl, p=2, kind="gibbs", block_n=512, block_m=512,
):
    """Step-list variant of :func:`gibbs_apply_sparse`."""
    N, D = x.shape
    M, _ = y.shape
    C = V.shape[-1]
    assert N % block_n == 0 and M % block_m == 0

    f32 = jnp.float32
    x32, y32 = x.astype(f32), y.astype(f32)
    eps32 = jnp.asarray(eps, f32)
    if p == 2 and kind not in ("energy", "inv_dist"):
        phi_eff = (phi.astype(f32) - 0.5 * (x32**2).sum(-1) / eps32) * LOG2E
        psi_eff = (psi.astype(f32) - 0.5 * (y32**2).sum(-1) / eps32) * LOG2E
    elif kind in ("energy", "inv_dist"):
        phi_eff, psi_eff = phi.astype(f32), psi.astype(f32)
    else:
        phi_eff = phi.astype(f32) * LOG2E
        psi_eff = psi.astype(f32) * LOG2E

    xhT, yhT = _split6_pair(x32.T, y32.T)
    psi_row = psi_eff[None, :]
    sqx = ((x32**2).sum(-1))[:, None]
    sqy = ((y32**2).sum(-1))[None, :]
    VT = V.astype(f32).T
    mxu = C >= MXU_MIN_CHANNELS
    if mxu:
        VT1 = _bf16_trunc(VT)
        VT = jnp.concatenate([VT1, VT - VT1], axis=0)
    eps_arr = eps32.reshape(1)

    # VPU-channel path keeps the C=1 live-buffer budget (scores + w +
    # one reduction temp); only the wide-C MXU path pays the split
    # buffers with a smaller row sub-block:
    if C == 1:
        target = 1024 * 2048
    elif not mxu:
        target = 1024 * 1024
    else:
        target = 256 * 1024
    bn = min(block_n, max(128, target // block_m))
    s = block_n // bn
    K = xhT.shape[0]
    nI = N // block_n
    nc, T_c = tbl.shape
    rows_c = min(nI, MAX_WALK_ROWS)

    def _it(tb, t):
        return (tb[t] >> 13) & 0x1FFF

    def _jt(tb, t):
        return tb[t] & 0x1FFF

    def launch(tbl_c, xhT_c, phi_c, sqx_c):
        in_specs = [
            pl.BlockSpec((K, bn), lambda k, t, tb, e: (0, _it(tb, t) * s + k)),
            pl.BlockSpec((K, block_m), lambda k, t, tb, e: (0, _jt(tb, t))),
            pl.BlockSpec((bn, 1), lambda k, t, tb, e: (_it(tb, t) * s + k, 0)),
            pl.BlockSpec((1, block_m), lambda k, t, tb, e: (0, _jt(tb, t))),
        ]
        ops = [xhT_c, yhT, phi_c, psi_row]
        if not (p == 2 and kind not in ("energy", "inv_dist")):
            in_specs += [
                pl.BlockSpec((bn, 1), lambda k, t, tb, e: (_it(tb, t) * s + k, 0)),
                pl.BlockSpec((1, block_m), lambda k, t, tb, e: (0, _jt(tb, t))),
            ]
            ops += [sqx_c, sqy]
        in_specs.append(
            pl.BlockSpec((VT.shape[0], block_m), lambda k, t, tb, e: (0, _jt(tb, t)))
        )
        ops.append(VT)
        if not mxu:
            out_specs = pl.BlockSpec(
                (bn, C), lambda k, t, tb, e: (_it(tb, t) * s + k, 0)
            )
            out_shape = jax.ShapeDtypeStruct((rows_c * block_n, C), f32)
        else:
            # Transposed accumulation (see _vt_dot_w): (C, bn) blocks.
            out_specs = pl.BlockSpec(
                (C, bn), lambda k, t, tb, e: (0, _it(tb, t) * s + k)
            )
            out_shape = jax.ShapeDtypeStruct((C, rows_c * block_n), f32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(s, T_c),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[],
        )
        out = pl.pallas_call(
            functools.partial(_apply_walk_kernel, p=p, kind=kind, mxu=mxu),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=_interpret(),
        )(tbl_c, eps_arr, *ops)
        return out if not mxu else out.T

    return _launch_walk(
        launch, nI, tbl,
        [(xhT, 1, 0.0), (phi_eff[:, None], 0, NEG_INF), (sqx, 0, 0.0)],
    )


def tile_stats(x, block):
    """Per-tile centroids and radii of a (padded) sorted point cloud.

    Args:
        x: ``(N, D)`` with ``N`` a multiple of ``block``.

    Returns:
        centroids ``(N/block, D)``, radii ``(N/block,)``.
    """
    N, D = x.shape
    nt = N // block
    xt = x.reshape(nt, block, D)
    cent = xt.mean(axis=1)
    rad = jnp.sqrt(((xt - cent[:, None, :]) ** 2).sum(-1)).max(axis=1)
    return cent, rad


#: Bound on the sub-blocks used for tile-geometry statistics: keep-score
#: matrices are built at sub-block granularity ((n_stat, n_stat) f32,
#: <= 268 MB at the bound) and max-pooled to kernel tiles.
MAX_STAT_BLOCKS = 8192


def _stat_block(npad, block):
    """Sub-block size for the keep-score geometry statistics.

    The space-filling-curve sort leaves a few *seam* tiles spanning two
    far-apart patches of the data manifold (measured on the 3D benchmark
    spheres: median tile radius 2x the compact ideal, p99 ~ 6x). A seam
    tile's centroid+radius bound is vacuous — ``d_lb = 0`` against most
    of the cloud — so its keep scores tie and the top-k keeps an
    *arbitrary* tile set, silently dropping the row's true neighborhood.
    Computing the bound on small sub-blocks and max-pooling to tiles
    fixes this: sub-blocks are curve-tight except the rare seam block,
    and a fat sub-block only *loosens* its own row (keeps extra), never
    causes a false exclude.
    """
    sb = 64
    while npad // sb > MAX_STAT_BLOCKS:
        sb *= 2
    return min(sb, block)


def _tile_maxpool(score, bpt):
    """Max-pool an ``(nI bpt, nJ bpt)`` sub-block score to ``(nI, nJ)``
    tiles via strided slices: a plain ``reshape(nI, bpt, nJ, bpt)`` puts
    tiny trailing axes in the minor layout positions, which the TPU pads
    to (8, 128) tiles — a 64x HBM expansion (16 GB at 4M points)."""
    if bpt == 1:
        return score
    s = functools.reduce(
        jnp.maximum, [score[:, k::bpt] for k in range(bpt)]
    )
    return functools.reduce(
        jnp.maximum, [s[k::bpt, :] for k in range(bpt)]
    )


def _pair_dist_lb(cx, rx, cy, ry):
    """Lower bound on pointwise distances between two block partitions:
    centroid distance minus the two radii (clipped at 0). The centroid
    distances go through the dot expansion (one MXU matmul at f32-exact
    precision) so the ``(n_stat, n_stat, D)`` broadcast is never
    materialized."""
    sq = (
        (cx**2).sum(-1)[:, None]
        + (cy**2).sum(-1)[None, :]
        - 2.0 * jnp.dot(cx, cy.T, precision=COORD_PRECISION)
    )
    dist = jnp.sqrt(jnp.clip(sq, min=1e-12))
    return jnp.maximum(dist - rx[:, None] - ry[None, :], 0.0)


def _cols_from_score(score, cap):
    cap = min(cap, score.shape[1])
    vals, idx = lax.top_k(score, cap)
    counts = jnp.maximum((vals > 0).sum(axis=1), 1).astype(jnp.int32)
    # Masked-out steps must repeat the *last kept* tile: the block index
    # then never changes past ``counts[i]``, so the pipeline issues no new
    # DMA and the skipped grid steps are nearly free. (Pointing them at
    # the first tile would re-fetch it on every masked step.)
    last = jnp.take_along_axis(idx, (counts - 1)[:, None], axis=1)
    cols = jnp.where(vals > 0, idx, last).astype(jnp.int32)
    return cols, counts, vals


def retighten_counts(vals, delta):
    """Per-row kept-tile counts after shifting every keep score by ``delta``.

    The truncation score ``max f + max g - C + truncate * eps`` moves by a
    *uniform* ``truncate * (eps' - eps)`` when the temperature changes, so
    the top-k order of ``cols`` is unchanged and only the threshold moves:
    the same tables serve every annealing step with tighter counts
    (``delta <= 0`` since eps decreases).
    """
    return jnp.maximum((vals + delta > 0).sum(axis=1), 1).astype(jnp.int32)


def build_tile_masks(x, y, f, g, eps, p, truncate, block, cap=None, w_x=None,
                     w_y=None, sym=False, stat_block=None):
    """Both traversal directions of the truncation pattern, from one score.

    ``block`` is used for both row and column tiles (so a cloud can appear
    on either side of a problem with a single padding constraint).
    When point weights ``w_x``/``w_y`` are given, zero-weight (padding)
    points are excluded from the potential bounds and pure-padding tiles
    are never kept. ``sym=True`` declares the problem symmetric (``y is
    x``, ``g is f``) so the transposed top-k is a free copy.

    The keep score is the *pointwise-centroid* rule of the reference's
    ``kernel_truncation`` — ``max f + max g - C(centroids) + truncate *
    eps`` — evaluated at ``stat_block`` sub-block granularity and
    max-pooled to tiles (see :func:`_stat_block` for why tile-level
    geometry is unsafe). A rigorous radii-subtracted lower bound on C was
    tried and rejected: extending every kept disk by the two block radii
    inflates kept counts ~2.4x past the true set, saturating the cap, and
    the loose bound's top-k ordering then drops *true* neighbors
    (measured at 128k: every row saturated at cap=32 while the true set
    was <= 29, worst row missing 27 of its true tiles). The centroid rule
    under-keeps only marginal pairs at the keep-radius edge — the
    ``truncate * eps`` margin's job — and is the rule the coarse-phase
    tables (``masks_from_coarse``) have validated at every scale.
    """
    nI = x.shape[0] // block
    nJ = y.shape[0] // block
    if cap is None:
        cap = max(32, min(nJ // 8, 128))
    # SMEM budget per launch (see MAX_TABLE_ROWS):
    cap = min(cap, max(8, 225_000 // min(max(nI, nJ), MAX_TABLE_ROWS)))

    sb = stat_block if stat_block is not None else _stat_block(
        max(x.shape[0], y.shape[0]), block
    )
    bpt = block // sb

    def _blk_stats(pts, v, w, nt):
        """Mass-weighted sub-block centroids, masked potential maxima."""
        pb = pts.reshape(nt, sb, -1)
        if w is None:
            return pb.mean(axis=1), v.reshape(nt, sb).max(axis=1), (
                jnp.ones((nt,), bool)
            )
        wt = jnp.maximum(w.reshape(nt, sb), 0.0)
        wsum = wt.sum(axis=1)
        cent = (pb * wt[..., None]).sum(axis=1) / jnp.maximum(
            wsum, 1e-30
        )[:, None]
        # Pure-padding blocks: park at the plain mean (never kept anyway).
        cent = jnp.where(wsum[:, None] > 0, cent, pb.mean(axis=1))
        vm = jnp.where(wt > 0, v.reshape(nt, sb), NEG_INF).max(axis=1)
        return cent, vm, wsum > 0

    cx, f_max, x_mass = _blk_stats(x, f, w_x, x.shape[0] // sb)
    cy, g_max, y_mass = _blk_stats(y, g, w_y, y.shape[0] // sb)

    sq = (
        (cx**2).sum(-1)[:, None]
        + (cy**2).sum(-1)[None, :]
        - 2.0 * jnp.dot(cx, cy.T, precision=COORD_PRECISION)
    )
    sq = jnp.clip(sq, min=0.0)
    C_c = sq / 2 if p == 2 else jnp.sqrt(jnp.clip(sq, min=1e-12))
    score = f_max[:, None] + g_max[None, :] - C_c + truncate * eps
    score = jnp.where(x_mass[:, None] & y_mass[None, :], score, NEG_INF)
    score = _tile_maxpool(score, bpt)  # (nI, nJ)

    cols, counts, vals = _cols_from_score(score, cap)
    if sym:
        colsT, countsT, valsT = cols, counts, vals
    else:
        colsT, countsT, valsT = _cols_from_score(score.T, cap)
    return TileMask(
        cols=cols, counts=counts, colsT=colsT, countsT=countsT,
        vals=vals, valsT=valsT,
    )


def extrap_cols(x_rows, y_src, h, eps, truncate, block_n, block_m, cap, p=2,
                stat_block=None):
    """Kept-column tables for a one-direction truncated softmin.

    Serves the detached coarse/mid -> fine extrapolation
    (``models/multiscale.py``): ``S_i = -eps log sum_j exp(h_j - C_ij/eps)``
    over a *small* source cloud ``y_src`` (coarse centroids or pooled mid
    blocks) for every fine row point. Round 3 ran these four sweeps dense —
    ``O(N * M_src)`` pairs, the dominant superlinear term at 2M-4M (440 ms
    of 3.47 s at 2M, committed in PROFILE_PHASES.jsonl).

    Keep rule: a column tile ``J`` survives for row tile ``I`` when its
    best possible score upper bound ``h_max[J] - C_lb(I, J)/eps`` lies
    within ``truncate`` (nats) of the row's best upper bound — the LSE
    analogue of the reference's ``kernel_truncation`` margin
    (``_legacy/sinkhorn_samples.py:493-530``). ``C_lb`` subtracts the
    *source* tile radius (rigorous on the reduction side); the row side
    uses sub-block centroids like :func:`build_tile_masks`.

    Returns ``(cols, counts)`` for :func:`lse_sparse` with
    ``block_n/block_m`` tiling.
    """
    N = x_rows.shape[0]
    M = y_src.shape[0]
    nI = N // block_n
    nJ = M // block_m
    cap = min(cap, nJ)

    sbx = stat_block if stat_block is not None else _stat_block(N, block_n)
    sbx = min(sbx, block_n)
    bpt = block_n // sbx
    sby = min(32, block_m)
    spt = block_m // sby
    cx, rx = tile_stats(x_rows, sbx)
    cy, ry = tile_stats(y_src, sby)
    h_smax = h.reshape(M // sby, sby).max(axis=1)

    sq = (
        (cx**2).sum(-1)[:, None]
        + (cy**2).sum(-1)[None, :]
        - 2.0 * jnp.dot(cx, cy.T, precision=COORD_PRECISION)
    )
    dist = jnp.sqrt(jnp.clip(sq, min=1e-12))
    rr = rx[:, None] + ry[None, :]

    def C_of(d):
        return 0.5 * d**2 if p == 2 else d

    # Keep score U: sub-block-centroid rule on BOTH sides (the validated
    # build_tile_masks recipe — sub-blocks are curve-tight, so seam tiles
    # neither inflate their own score nor evict true neighbors from the
    # top-k; the truncate margin absorbs the sub-block radii).
    # Threshold: each row's max score is lower-bounded RIGOROUSLY by
    # evaluating any sub-block's best h point at the worst-case distance
    # (dist + both radii). Thresholding tight-ish U against max_J L cannot
    # drop a true-best tile — the failure mode of the naive "threshold
    # against max U" rule (measured ~1 nat of LSE error from seam tiles
    # whose radius-swallowed lower bounds inflated the row max).
    U = h_smax[None, :] - C_of(dist) / eps
    L = h_smax[None, :] - C_of(dist + rr) / eps
    thr = L.max(axis=1)  # (N/sbx,) per-sub-block row-max lower bound
    if spt > 1:
        U = functools.reduce(jnp.maximum, [U[:, k::spt] for k in range(spt)])
    if bpt > 1:
        U = functools.reduce(jnp.maximum, [U[k::bpt, :] for k in range(bpt)])
        # Valid for every row of the tile => take the weakest sub-block:
        thr = functools.reduce(
            jnp.minimum, [thr[k::bpt] for k in range(bpt)]
        )
    score = U - thr[:, None] + truncate
    cols, counts, _ = _cols_from_score(score, cap)
    return cols, counts


def softmin_extrap_truncated(rows_pts, src_pts, h, eps, truncate, block_n,
                             p=2, block_m=128, cap=24):
    """Detached truncated one-direction softmin onto a fine cloud (see
    :func:`extrap_cols`). Falls back to the exact result only through the
    keep margin — callers gate on cloud sizes and detachment."""
    eps = jnp.asarray(eps, jnp.float32)
    cols, counts = extrap_cols(
        rows_pts, src_pts, h, eps, truncate, block_n, block_m, cap, p=p
    )
    tbl = walk_plan(cols, counts, max(12, cap // 2))
    return -eps * lse_walk(
        rows_pts, src_pts, h, eps, tbl, p=p,
        block_n=block_n, block_m=block_m,
    )


def masks_from_coarse(
    cx, cy, f_c, g_c, w_x, w_y, eps, p, truncate, blocks_per_tile, cap=None,
    sym=False, cost=None,
):
    """Tile masks from the reference's *pointwise* centroid keep rule.

    The reference prunes cluster pairs with
    ``f_c[k] + g_c[l] > C(c_k, c_l) - truncate * eps``
    (``_legacy/sinkhorn_samples.py:493-530``) using the coarse potentials.
    We evaluate the same score on the cluster-block centroids (tight — no
    tile-radius slack) and max-pool it onto kernel tiles, each of which
    covers ``blocks_per_tile`` consecutive blocks.

    Args:
        cx, cy: ``(K_x, D)`` / ``(K_y, D)`` block centroids (sorted order).
        f_c, g_c: coarse dual potentials on the centroids.
        w_x, w_y: coarse block weights (zero = padding, never kept).
        blocks_per_tile: TILE // block_size.
        cap: static bound on kept column tiles per row tile.
        sym: the problem is symmetric (``cy is cx``, ``g_c is f_c``) — the
            pooled score matrix equals its transpose, so the transposed
            top-k is a free copy (the xx / yy debias masks).

    Returns:
        :class:`TileMask`.
    """
    from .costs import cost_routines

    if cost is None:
        C = cost_routines[p](cx, cy)  # (K_x, K_y)
    else:
        # The reference's custom-cost truncation evaluates the user's
        # routine between cluster centroids (same smoothness assumption,
        # ``_legacy/sinkhorn_samples.py:505-516``):
        C = cost(cx[None], cy[None])[0]
    score = f_c[:, None] + g_c[None, :] - C + truncate * eps
    valid = (w_x > 0)[:, None] & (w_y > 0)[None, :]
    score = jnp.where(valid, score, NEG_INF)

    Kx, Ky = score.shape
    nI, nJ = Kx // blocks_per_tile, Ky // blocks_per_tile
    score_t = score.reshape(nI, blocks_per_tile, nJ, blocks_per_tile).max(
        axis=(1, 3)
    )
    if cap is None:
        # Masked grid steps are compute-gated but still cost ~0.5 us of
        # scalar-core bookkeeping each, so the cap is bounded at 128 (the
        # SMEM lane-padding free limit); the per-eps table slicing in
        # models/multiscale.py trims the live grid further.
        cap = max(32, min(nJ // 8, 128))
    # The cols arrays are scalar-prefetch operands living in SMEM (~1 MB
    # per LAUNCH), padded to 128 lanes on the minor axis: any cap <= 128
    # costs 512 bytes per table row. Tables beyond MAX_TABLE_ROWS rows are
    # split into per-chunk launches (``_launch_chunked``), so only the
    # chunk row count binds here.
    cap = min(cap, max(8, 225_000 // min(max(nI, nJ), MAX_TABLE_ROWS)))
    cols, counts, vals = _cols_from_score(score_t, cap)
    if sym:
        colsT, countsT, valsT = cols, counts, vals
    else:
        colsT, countsT, valsT = _cols_from_score(score_t.T, cap)
    return TileMask(
        cols=cols, counts=counts, colsT=colsT, countsT=countsT,
        vals=vals, valsT=valsT,
    )


# ==============================================================================
#  Sparse streaming LSE
# ==============================================================================


def _lse_sparse_kernel(
    cols_ref, counts_ref, eps_ref, xhT_ref, yhT_ref, h_ref, sqx_ref, sqy_ref,
    o_ref, m_ref, s_ref, *, p, s=1,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)

    i = pl.program_id(0)

    @pl.when(j < counts_ref[i // s])
    def _compute():
        c2 = LOG2E / eps_ref[0]
        h2 = h_ref[:]  # base-2 units; p=2 also folds the column quadratic
        scores = _scores_dot(xhT_ref[:], yhT_ref[:])
        if p == 2:
            arg = h2 + scores * c2
        else:
            sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
            # f32 noise floor of the expansion form (pallas_kernels.py):
            d = jnp.where(sq > 2e-6 * (sqx_ref[:] + sqy_ref[:]),
                      jnp.sqrt(jnp.maximum(sq, 1e-8)), 0.0)
            arg = h2 - d * c2
        m_prev = m_ref[:]
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
def lse_sparse(x, y, h, eps, cols, counts, p=2, block_n=256, block_m=512):
    """Truncated ``log sum_j exp(h_j - C_p/eps)``: only the column tiles in
    ``cols`` are visited. Shapes: x ``(N, D)``, y ``(M, D)`` with N, M
    multiples of the tile sizes; cols ``(N/block_n, cap)``.
    """
    N, D = x.shape
    M, _ = y.shape
    assert N % block_n == 0 and M % block_m == 0
    nI, cap = cols.shape

    f32 = jnp.float32
    eps32 = jnp.asarray(eps, f32)
    x32, y32 = x.astype(f32), y.astype(f32)
    xhT, yhT = _split6_pair(x32.T, y32.T)  # f32-exact scores on the bf16 MXU
    h2 = h.astype(f32) * LOG2E
    if p == 2:
        h2 = h2 - (0.5 * LOG2E / eps32) * (y32**2).sum(-1)
    h2 = h2[None, :]
    sqx = ((x32**2).sum(-1))[:, None]
    sqy = ((y32**2).sum(-1))[None, :]
    eps_arr = eps32.reshape(1)

    # Row subdivision (see _absorbed_sum): SMEM tables stay at tile
    # granularity while VMEM blocks stay bounded.
    bn = min(block_n, max(128, (1024 * 2048) // block_m))
    s = block_n // bn

    K = xhT.shape[0]

    def launch(cols_c, counts_c, xhT_c, sqx_c):
        nI_c = cols_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # cols, counts, eps
            grid=(nI_c * s, cap),
            in_specs=[
                pl.BlockSpec((K, bn), lambda i, j, cols, counts, eps: (0, i)),
                pl.BlockSpec(
                    (K, block_m), lambda i, j, cols, counts, eps: (0, _col(cols, counts, i // s, j))
                ),
                pl.BlockSpec(
                    (1, block_m), lambda i, j, cols, counts, eps: (0, _col(cols, counts, i // s, j))
                ),
                pl.BlockSpec((bn, 1), lambda i, j, cols, counts, eps: (i, 0)),
                pl.BlockSpec(
                    (1, block_m), lambda i, j, cols, counts, eps: (0, _col(cols, counts, i // s, j))
                ),
            ],
            out_specs=pl.BlockSpec(
                (bn, 1), lambda i, j, cols, counts, eps: (i, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((bn, 1), f32),
                pltpu.VMEM((bn, 1), f32),
            ],
        )
        return pl.pallas_call(
            functools.partial(_lse_sparse_kernel, p=p, s=s),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nI_c * block_n, 1), f32),
            interpret=_interpret(),
        )(cols_c, counts_c, eps_arr, xhT_c, yhT, h2, sqx_c, sqy)

    out = _launch_chunked(
        launch, nI, cols, counts, [(xhT, 1), (sqx, 0)]
    )

    out = out[:, 0] * LN2  # back to natural-log units
    if p == 2:
        out = out - 0.5 * (x32**2).sum(-1) / eps32
    return out


# ==============================================================================
#  Sparse streaming Gibbs matvec (for the VJP of the truncated softmin)
# ==============================================================================


def _apply_sparse_kernel(
    cols_ref, counts_ref, eps_ref, xhT_ref, yhT_ref, phi_ref, psi_ref,
    sqx_ref, sqy_ref, VT_ref, o_ref, acc_ref, *, p, kind, mxu, s=1,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    i = pl.program_id(0)

    @pl.when(j < counts_ref[i // s])
    def _compute():
        c2 = LOG2E / eps_ref[0]
        scores = _scores_dot(xhT_ref[:], yhT_ref[:])
        if p == 2 and kind not in ("energy", "inv_dist"):
            w = jnp.exp2(phi_ref[:] + (psi_ref[:] + scores * c2))
        else:
            sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
            d = jnp.sqrt(jnp.maximum(sq, 1e-8))
            if kind == "energy":
                w = -d
            elif kind == "inv_dist":
                # Zero below the f32 noise floor of the expansion form
                # (see ops/softmin.py::GRAD_SQDIST_CUT).
                w = jnp.where(sq > 1e-6, 1.0 / d, 0.0)
            else:
                dw = jnp.where(sq > 2e-6 * (sqx_ref[:] + sqy_ref[:]), d, 0.0)
                w = jnp.exp2(phi_ref[:] + (psi_ref[:] - dw * c2))
                if kind == "gibbs_grad":
                    w = jnp.where(sq > 1e-6, w / d, 0.0)
        if not mxu:
            # Exact f32 per-channel broadcast multiply + row reduction on
            # the VPU (see _vpu_channels; also sidesteps Mosaic's C=1
            # dot_general-into-accumulator limitation).
            acc_ref[:] += _vpu_channels(w, VT_ref[:])
        else:
            # Wide-C: bf16-exact summand split, transposed (C, bn)
            # accumulation (see _vt_dot_w for the MXU layout rationale):
            acc_ref[:] += _vt_dot_w(VT_ref[:], w)

    @pl.when(j == nj - 1)
    def _finalize():
        o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("p", "kind", "block_n", "block_m")
)
def gibbs_apply_sparse(
    x, y, phi, psi, V, eps, cols, counts, p=2, kind="gibbs",
    block_n=256, block_m=512,
):
    """Truncated ``O_i = sum_j w_ij V_j`` over the column tiles in ``cols``.
    Same weight kinds as :func:`geomloss_tpu.ops.softmin.gibbs_apply`."""
    N, D = x.shape
    M, _ = y.shape
    C = V.shape[-1]
    assert N % block_n == 0 and M % block_m == 0
    nI, cap = cols.shape

    f32 = jnp.float32
    x32, y32 = x.astype(f32), y.astype(f32)
    eps32 = jnp.asarray(eps, f32)

    if p == 2 and kind not in ("energy", "inv_dist"):
        # Quadratic terms folded into the biases, in base-2 units:
        phi_eff = (phi.astype(f32) - 0.5 * (x32**2).sum(-1) / eps32) * LOG2E
        psi_eff = (psi.astype(f32) - 0.5 * (y32**2).sum(-1) / eps32) * LOG2E
    elif kind in ("energy", "inv_dist"):
        phi_eff, psi_eff = phi.astype(f32), psi.astype(f32)
    else:  # p = 1 Gibbs kinds: biases in base-2 units
        phi_eff = phi.astype(f32) * LOG2E
        psi_eff = psi.astype(f32) * LOG2E

    xhT, yhT = _split6_pair(x32.T, y32.T)
    phi_col = phi_eff[:, None]
    psi_row = psi_eff[None, :]
    sqx = ((x32**2).sum(-1))[:, None]
    sqy = ((y32**2).sum(-1))[None, :]
    VT = V.astype(f32).T
    mxu = C >= MXU_MIN_CHANNELS
    if mxu:
        # bf16-exact summand split (narrow C uses exact f32 VPU
        # row reductions instead):
        VT1 = _bf16_trunc(VT)
        VT = jnp.concatenate([VT1, VT - VT1], axis=0)  # (2 C, M)
    eps_arr = eps32.reshape(1)

    # Row subdivision: large logical tiles share one cols row across s
    # row sub-blocks, keeping the SMEM tables at tile granularity while
    # the VMEM-resident (bn, block_m) weight block stays well under the
    # ~16 MB budget. The wide-C MXU path keeps THREE live W-sized buffers
    # (W, w1, w2): measured at 2M / bm=1024, bn=256 runs 2.4x faster than
    # bn=1024 (158 vs 375 ms — the fat buffers defeat double-buffering);
    # the VPU-channel path has no split buffers and keeps a near-C=1
    # budget:
    if C == 1:
        target = 1024 * 2048
    elif not mxu:
        target = 1024 * 1024
    else:
        target = 256 * 1024
    bn = min(block_n, max(128, target // block_m))
    s = block_n // bn

    K = xhT.shape[0]

    def launch(cols_c, counts_c, xhT_c, phi_c, sqx_c):
        nI_c = cols_c.shape[0]
        if not mxu:
            out_specs = pl.BlockSpec((bn, C), lambda i, j, c, n, e: (i, 0))
            out_shape = jax.ShapeDtypeStruct((nI_c * block_n, C), f32)
            scratch = pltpu.VMEM((bn, C), f32)
        else:
            # Transposed accumulation (see _vt_dot_w): (C, bn) blocks.
            out_specs = pl.BlockSpec((C, bn), lambda i, j, c, n, e: (0, i))
            out_shape = jax.ShapeDtypeStruct((C, nI_c * block_n), f32)
            scratch = pltpu.VMEM((C, bn), f32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nI_c * s, cap),
            in_specs=[
                pl.BlockSpec((K, bn), lambda i, j, c, n, e: (0, i)),
                pl.BlockSpec((K, block_m), lambda i, j, c, n, e: (0, _col(c, n, i // s, j))),
                pl.BlockSpec((bn, 1), lambda i, j, c, n, e: (i, 0)),
                pl.BlockSpec((1, block_m), lambda i, j, c, n, e: (0, _col(c, n, i // s, j))),
                pl.BlockSpec((bn, 1), lambda i, j, c, n, e: (i, 0)),
                pl.BlockSpec((1, block_m), lambda i, j, c, n, e: (0, _col(c, n, i // s, j))),
                pl.BlockSpec((VT.shape[0], block_m), lambda i, j, c, n, e: (0, _col(c, n, i // s, j))),
            ],
            out_specs=out_specs,
            scratch_shapes=[scratch],
        )
        out = pl.pallas_call(
            functools.partial(_apply_sparse_kernel, p=p, kind=kind, mxu=mxu, s=s),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=_interpret(),
        )(cols_c, counts_c, eps_arr, xhT_c, yhT, phi_c, psi_row, sqx_c, sqy, VT)
        return out if not mxu else out.T

    out = _launch_chunked(
        launch, nI, cols, counts, [(xhT, 1), (phi_col, 0), (sqx, 0)]
    )

    return out


# ==============================================================================
#  Single-pass absorbed sparse softmin (fused Sinkhorn step, fine phase)
# ==============================================================================
#
# Same trick as the dense fused step (``pallas_kernels.py``): during the
# annealing descent the absorbed Gibbs matrix
# ``W = exp((f + g - C)/eps + loga + logb)`` is bounded (``W <= (NM)^2``
# after any averaged update followed by an eps drop), so each softmin
# direction is one single-pass sum — `gibbs_apply_sparse` with a ones
# channel — instead of a two-pass (max, then exp-sum) LSE sweep.

_SUM_FLOOR = 1e-37


def _row_sum_sparse_kernel(
    cols_ref, counts_ref, eps_ref, xhT_ref, yhT_ref, phi_ref, psi_ref,
    sqx_ref, sqy_ref, o_ref, acc_ref, *, p, s=1,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    i = pl.program_id(0)

    @pl.when(j < counts_ref[i // s])
    def _compute():
        c2 = LOG2E / eps_ref[0]
        scores = _scores_dot(xhT_ref[:], yhT_ref[:])
        if p == 2:
            W = jnp.exp2(phi_ref[:] + (psi_ref[:] + scores * c2))
        else:
            sq = sqx_ref[:] + sqy_ref[:] - 2.0 * scores
            # f32 noise floor of the expansion form (pallas_kernels.py):
            d = jnp.where(sq > 2e-6 * (sqx_ref[:] + sqy_ref[:]),
                      jnp.sqrt(jnp.maximum(sq, 1e-8)), 0.0)
            W = jnp.exp2(phi_ref[:] + (psi_ref[:] - d * c2))
        acc_ref[:] += jnp.sum(W, axis=1, keepdims=True)

    @pl.when(j == nj - 1)
    def _finalize():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("p", "block"))
def _absorbed_sum(x, y, phi, psi, eps, cols, counts, p, block):
    """Single-pass ``r_i = sum_j exp(phi_i + psi_j - C_ij/eps)`` over the
    kept tiles (biases in natural-log units; quadratic folding as in
    :func:`gibbs_apply_sparse`).

    Large logical tiles are subdivided along rows (``s`` row sub-blocks
    sharing one ``cols`` row): the SMEM tables stay at tile granularity
    while the VMEM-resident score block stays within budget.
    """
    N, D = x.shape
    M, _ = y.shape
    assert N % block == 0 and M % block == 0
    nI, cap = cols.shape
    # (bn, block) scores + W must fit in ~16 MB VMEM: scale the row
    # sub-block inversely with the column width.
    bn = min(block, max(128, (1024 * 2048) // block))
    s = block // bn

    f32 = jnp.float32
    x32, y32 = x.astype(f32), y.astype(f32)
    eps32 = jnp.asarray(eps, f32)
    if p == 2:
        phi_eff = (phi.astype(f32) - 0.5 * (x32**2).sum(-1) / eps32) * LOG2E
        psi_eff = (psi.astype(f32) - 0.5 * (y32**2).sum(-1) / eps32) * LOG2E
    else:
        phi_eff = phi.astype(f32) * LOG2E
        psi_eff = psi.astype(f32) * LOG2E

    xhT, yhT = _split6_pair(x32.T, y32.T)
    sqx = ((x32**2).sum(-1))[:, None]
    sqy = ((y32**2).sum(-1))[None, :]
    eps_arr = eps32.reshape(1)

    K = xhT.shape[0]
    psi_row = psi_eff[None, :]

    def launch(cols_c, counts_c, xhT_c, phi_c, sqx_c):
        nI_c = cols_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nI_c * s, cap),
            in_specs=[
                pl.BlockSpec((K, bn), lambda i, j, c, n, e: (0, i)),
                pl.BlockSpec((K, block), lambda i, j, c, n, e: (0, _col(c, n, i // s, j))),
                pl.BlockSpec((bn, 1), lambda i, j, c, n, e: (i, 0)),
                pl.BlockSpec((1, block), lambda i, j, c, n, e: (0, _col(c, n, i // s, j))),
                pl.BlockSpec((bn, 1), lambda i, j, c, n, e: (i, 0)),
                pl.BlockSpec((1, block), lambda i, j, c, n, e: (0, _col(c, n, i // s, j))),
            ],
            out_specs=pl.BlockSpec((bn, 1), lambda i, j, c, n, e: (i, 0)),
            scratch_shapes=[pltpu.VMEM((bn, 1), f32)],
        )
        return pl.pallas_call(
            functools.partial(_row_sum_sparse_kernel, p=p, s=s),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nI_c * block, 1), f32),
            interpret=_interpret(),
        )(cols_c, counts_c, eps_arr, xhT_c, yhT, phi_c, psi_row, sqx_c, sqy)

    r = _launch_chunked(
        launch, nI, cols, counts,
        [(xhT, 1), (phi_eff[:, None], 0), (sqx, 0)],
    )

    return jnp.maximum(r[:, 0], _SUM_FLOOR)


def sinkhorn_step_sparse(eps, x, y, a_log, b_log, f, g, mask, p=2, block=512, sym=False):
    """Both raw softmin values of one truncated Sinkhorn iteration
    (fine-phase analogue of ``ops/softmin.py::sinkhorn_step_points``)."""
    eps32 = jnp.asarray(eps, jnp.float32)
    phi = a_log + f / eps32
    psi = b_log + g / eps32
    r = _absorbed_sum(x, y, phi, psi, eps32, mask.cols, mask.counts, p, block)
    S_xy = (f + eps32 * (a_log - jnp.log(r))).astype(f.dtype)
    if sym:
        return S_xy, None
    c = _absorbed_sum(y, x, psi, phi, eps32, mask.colsT, mask.countsT, p, block)
    S_yx = (g + eps32 * (b_log - jnp.log(c))).astype(g.dtype)
    return S_xy, S_yx


# ------------------------------------------------------------------------------
#  Fused differentiable sparse extrapolation
# ------------------------------------------------------------------------------


def _extrap_dx_sparse(x, y, f, g, loga, logb, eps, S, u, cols, counts, p, block):
    """d<u, S_xy>/dx for the absorbed truncated softmin (row direction)."""
    logr = (f - S) / eps + loga
    phi = f / eps + loga - logr  # row-normalized absorbed weights
    psi = g / eps + logb
    if p == 2:
        # Row-normalized weights sum to exactly 1, so the ones channel is
        # analytic: dx = u * (x - sum_j w~_ij y_j). One fewer VPU channel
        # pass per apply. (p=1 divides by the distance — not normalized.)
        R = gibbs_apply_sparse(
            x, y, phi, psi, y.astype(jnp.float32), eps, cols, counts,
            p=p, kind="gibbs", block_n=block, block_m=block,
        )
        return u[:, None] * (x - R)
    ones = jnp.ones((y.shape[0], 1), dtype=jnp.float32)
    V = jnp.concatenate([ones, y.astype(jnp.float32)], axis=-1)
    R = gibbs_apply_sparse(
        x, y, phi, psi, V, eps, cols, counts,
        p=p, kind="gibbs_grad", block_n=block, block_m=block,
    )
    return u[:, None] * (x * R[:, :1] - R[:, 1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def softmin_extrapolation_sparse(
    x, y, f, g, loga, logb, eps, cols, counts, colsT, countsT, p, block
):
    r"""Raw softmin pair of the truncated differentiable last extrapolation.

    Gradients flow to ``x`` through ``S_xy`` and to ``y`` through ``S_yx``
    only (detached-cost convention, reference
    ``_legacy/sinkhorn_samples.py:179-185``); everything else is constant.
    """
    mask = TileMask(cols, counts, colsT, countsT)
    return sinkhorn_step_sparse(
        eps, x, y, loga, logb, f, g, mask, p=p, block=block
    )


def _softmin_extrap_sparse_fwd(
    x, y, f, g, loga, logb, eps, cols, counts, colsT, countsT, p, block
):
    mask = TileMask(cols, counts, colsT, countsT)
    S_xy, S_yx = sinkhorn_step_sparse(
        eps, x, y, loga, logb, f, g, mask, p=p, block=block
    )
    return (S_xy, S_yx), (
        x, y, f, g, loga, logb, eps, cols, counts, colsT, countsT, S_xy, S_yx
    )


def _softmin_extrap_sparse_bwd(p, block, res, us):
    x, y, f, g, loga, logb, eps, cols, counts, colsT, countsT, S_xy, S_yx = res
    u_f, u_g = us
    dx = _extrap_dx_sparse(
        x, y, f, g, loga, logb, eps, S_xy, u_f, cols, counts, p, block
    )
    dy = _extrap_dx_sparse(
        y, x, g, f, logb, loga, eps, S_yx, u_g, colsT, countsT, p, block
    )
    z = jnp.zeros_like
    return (
        dx.astype(x.dtype),
        dy.astype(y.dtype),
        z(f), z(g), z(loga), z(logb),
        jnp.zeros_like(jnp.asarray(eps)),
        None, None, None, None,
    )


softmin_extrapolation_sparse.defvjp(
    _softmin_extrap_sparse_fwd, _softmin_extrap_sparse_bwd
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def softmin_extrapolation_sparse_sym(x, f, loga, eps, cols, counts, p, block):
    """Symmetric-problem (debias) truncated extrapolation: one direction,
    second cloud detached."""
    eps32 = jnp.asarray(eps, jnp.float32)
    phi = loga + f / eps32
    r = _absorbed_sum(x, x, phi, phi, eps32, cols, counts, p, block)
    return (f + eps32 * (loga - jnp.log(r))).astype(f.dtype)


def _softmin_extrap_sparse_sym_fwd(x, f, loga, eps, cols, counts, p, block):
    S = softmin_extrapolation_sparse_sym(x, f, loga, eps, cols, counts, p, block)
    return S, (x, f, loga, eps, cols, counts, S)


def _softmin_extrap_sparse_sym_bwd(p, block, res, u):
    x, f, loga, eps, cols, counts, S = res
    dx = _extrap_dx_sparse(
        x, x, f, f, loga, loga, eps, S, u, cols, counts, p, block
    )
    return (
        dx.astype(x.dtype),
        jnp.zeros_like(f),
        jnp.zeros_like(loga),
        jnp.zeros_like(jnp.asarray(eps)),
        None, None,
    )


softmin_extrapolation_sparse_sym.defvjp(
    _softmin_extrap_sparse_sym_fwd, _softmin_extrap_sparse_sym_bwd
)


def _extrap_dx_walk(x, y, f, g, loga, logb, eps, S, u, tbl, p, block):
    """d<u, S_xy>/dx for the absorbed truncated softmin (walk traversal)."""
    logr = (f - S) / eps + loga
    phi = f / eps + loga - logr
    psi = g / eps + logb
    if p == 2:
        # Normalized weights: analytic ones channel (see _extrap_dx_sparse).
        R = gibbs_apply_walk(
            x, y, phi, psi, y.astype(jnp.float32), eps, tbl, p=p,
            kind="gibbs", block_n=block, block_m=block,
        )
        return u[:, None] * (x - R)
    ones = jnp.ones((y.shape[0], 1), dtype=jnp.float32)
    V = jnp.concatenate([ones, y.astype(jnp.float32)], axis=-1)
    R = gibbs_apply_walk(
        x, y, phi, psi, V, eps, tbl, p=p, kind="gibbs_grad",
        block_n=block, block_m=block,
    )
    return u[:, None] * (x * R[:, :1] - R[:, 1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def softmin_extrapolation_walk(
    x, y, f, g, loga, logb, eps, tbl, tblT, p, block
):
    """Walk-traversal twin of :func:`softmin_extrapolation_sparse`."""
    return sinkhorn_step_walk(
        eps, x, y, loga, logb, f, g, tbl, tblT, p=p, block=block
    )


def _softmin_extrap_walk_fwd(x, y, f, g, loga, logb, eps, tbl, tblT, p, block):
    S_xy, S_yx = sinkhorn_step_walk(
        eps, x, y, loga, logb, f, g, tbl, tblT, p=p, block=block
    )
    return (S_xy, S_yx), (
        x, y, f, g, loga, logb, eps, tbl, tblT, S_xy, S_yx
    )


def _softmin_extrap_walk_bwd(p, block, res, us):
    x, y, f, g, loga, logb, eps, tbl, tblT, S_xy, S_yx = res
    u_f, u_g = us
    dx = _extrap_dx_walk(
        x, y, f, g, loga, logb, eps, S_xy, u_f, tbl, p, block
    )
    dy = _extrap_dx_walk(
        y, x, g, f, logb, loga, eps, S_yx, u_g, tblT, p, block
    )
    z = jnp.zeros_like
    return (
        dx.astype(x.dtype),
        dy.astype(y.dtype),
        z(f), z(g), z(loga), z(logb),
        jnp.zeros_like(jnp.asarray(eps)),
        None, None,
    )


softmin_extrapolation_walk.defvjp(
    _softmin_extrap_walk_fwd, _softmin_extrap_walk_bwd
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _softmin_extrap_walk_banded_p(
    x, y, f, g, loga, logb, eps, tblB, tblA, p, block, band_tiles,
    apply_band_tiles,
):
    return sinkhorn_step_walk_banded(
        eps, x, y, loga, logb, f, g, tblB, p=p, block=block,
        band_tiles=band_tiles,
    )


def softmin_extrapolation_walk_banded(
    x, y, f, g, loga, logb, eps, tblB, tblA, p, block,
    band_tiles=BAND_TILES, apply_band_tiles=None,
):
    """Banded twin of :func:`softmin_extrapolation_walk`: the forward
    computes both directions in ONE pass over the kept pairs
    (:func:`sinkhorn_step_walk_banded`); the backward computes BOTH
    gradient contractions in one dual-direction pass over ``tblA``.

    ``band_tiles`` must match ``tblB``'s plan and ``apply_band_tiles``
    (default: the module constant :data:`APPLY_BAND_TILES`, resolved at
    call time) must match ``tblA``'s — the packed tables carry no band
    tag, and a mismatched width silently corrupts the column direction.
    ``tblA`` must additionally be planned at
    ``rows_chunk=MAX_APPLY_ROWS`` (the apply kernel's chunking), which
    the launcher's chunk-count assert enforces."""
    if apply_band_tiles is None:
        apply_band_tiles = APPLY_BAND_TILES
    return _softmin_extrap_walk_banded_p(
        x, y, f, g, loga, logb, eps, tblB, tblA, p, block, band_tiles,
        apply_band_tiles,
    )


def _softmin_extrap_walk_banded_fwd(
    x, y, f, g, loga, logb, eps, tblB, tblA, p, block, band_tiles,
    apply_band_tiles,
):
    S_xy, S_yx = sinkhorn_step_walk_banded(
        eps, x, y, loga, logb, f, g, tblB, p=p, block=block,
        band_tiles=band_tiles,
    )
    return (S_xy, S_yx), (
        x, y, f, g, loga, logb, eps, tblA, S_xy, S_yx
    )


def _softmin_extrap_walk_banded_bwd(p, block, band_tiles, apply_band_tiles,
                                    res, us):
    x, y, f, g, loga, logb, eps, tblA, S_xy, S_yx = res
    u_f, u_g = us
    eps32 = jnp.asarray(eps, jnp.float32)
    f32 = jnp.float32
    x32, y32 = x.astype(f32), y.astype(f32)
    # RAW absorbed weights (normalization divided out below, from the
    # forward's row/column sums):
    phi = loga + f / eps32
    psi = logb + g / eps32
    if p == 2:
        Vy, Vx, kind = y32, x32, "gibbs"
    else:
        Vy = jnp.concatenate(
            [jnp.ones((y.shape[0], 1), f32), y32], axis=-1
        )
        Vx = jnp.concatenate(
            [jnp.ones((x.shape[0], 1), f32), x32], axis=-1
        )
        kind = "gibbs_grad"
    Rr, Rc = gibbs_apply_walk_banded(
        x, y, phi, psi, Vy, Vx, eps32, tblA, p=p, kind=kind, block=block,
        band_tiles=apply_band_tiles,
    )
    r = jnp.maximum(jnp.exp(loga + (f - S_xy) / eps32), _SUM_FLOOR)
    c = jnp.maximum(jnp.exp(logb + (g - S_yx) / eps32), _SUM_FLOOR)
    if p == 2:
        dx = u_f[:, None] * (x32 - Rr / r[:, None])
        dy = u_g[:, None] * (y32 - Rc / c[:, None])
    else:
        dx = u_f[:, None] * (x32 * (Rr[:, :1] / r[:, None])
                             - Rr[:, 1:] / r[:, None])
        dy = u_g[:, None] * (y32 * (Rc[:, :1] / c[:, None])
                             - Rc[:, 1:] / c[:, None])
    z = jnp.zeros_like
    return (
        dx.astype(x.dtype),
        dy.astype(y.dtype),
        z(f), z(g), z(loga), z(logb),
        jnp.zeros_like(jnp.asarray(eps)),
        None, None,
    )


_softmin_extrap_walk_banded_p.defvjp(
    _softmin_extrap_walk_banded_fwd, _softmin_extrap_walk_banded_bwd
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def softmin_extrapolation_walk_sym(x, f, loga, eps, tbl, p, block):
    """Walk-traversal twin of :func:`softmin_extrapolation_sparse_sym`."""
    eps32 = jnp.asarray(eps, jnp.float32)
    phi = loga + f / eps32
    r = _absorbed_sum_walk(x, x, phi, phi, eps32, tbl, p, block)
    return (f + eps32 * (loga - jnp.log(r))).astype(f.dtype)


def _softmin_extrap_walk_sym_fwd(x, f, loga, eps, tbl, p, block):
    S = softmin_extrapolation_walk_sym(x, f, loga, eps, tbl, p, block)
    return S, (x, f, loga, eps, tbl, S)


def _softmin_extrap_walk_sym_bwd(p, block, res, u):
    x, f, loga, eps, tbl, S = res
    dx = _extrap_dx_walk(
        x, x, f, f, loga, loga, eps, S, u, tbl, p, block
    )
    return (
        dx.astype(x.dtype),
        jnp.zeros_like(f),
        jnp.zeros_like(loga),
        jnp.zeros_like(jnp.asarray(eps)),
        None,
    )


softmin_extrapolation_walk_sym.defvjp(
    _softmin_extrap_walk_sym_fwd, _softmin_extrap_walk_sym_bwd
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _softmin_extrap_walk_banded_sym_p(
    x, f, loga, eps, tblB, tblA, p, block, band_tiles, apply_band_tiles
):
    return sinkhorn_step_walk_banded_sym(
        eps, x, loga, f, tblB, p=p, block=block, band_tiles=band_tiles
    )


def softmin_extrapolation_walk_banded_sym(
    x, f, loga, eps, tblB, tblA, p, block, band_tiles=BAND_TILES,
    apply_band_tiles=None,
):
    """Triangle-banded twin of :func:`softmin_extrapolation_walk_sym`:
    half the pair visits in both the forward (mirrored column sums) and
    the backward (dual apply on ``tblA``, mirrored contractions).

    Band widths must match the plans — see
    :func:`softmin_extrapolation_walk_banded`."""
    if apply_band_tiles is None:
        apply_band_tiles = APPLY_BAND_TILES
    return _softmin_extrap_walk_banded_sym_p(
        x, f, loga, eps, tblB, tblA, p, block, band_tiles, apply_band_tiles
    )


def _softmin_extrap_walk_banded_sym_fwd(x, f, loga, eps, tblB, tblA, p,
                                        block, band_tiles,
                                        apply_band_tiles):
    S = sinkhorn_step_walk_banded_sym(
        eps, x, loga, f, tblB, p=p, block=block, band_tiles=band_tiles
    )
    return S, (x, f, loga, eps, tblA, S)


def _softmin_extrap_walk_banded_sym_bwd(p, block, band_tiles,
                                        apply_band_tiles, res, u):
    x, f, loga, eps, tblA, S = res
    eps32 = jnp.asarray(eps, jnp.float32)
    f32 = jnp.float32
    x32 = x.astype(f32)
    phi = loga + f / eps32
    if p == 2:
        V, kind = x32, "gibbs"
    else:
        V = jnp.concatenate([jnp.ones((x.shape[0], 1), f32), x32], axis=-1)
        kind = "gibbs_grad"
    Rr, Rc = gibbs_apply_walk_banded(
        x, x, phi, phi, V, V, eps32, tblA, p=p, kind=kind, block=block,
        band_tiles=apply_band_tiles,
    )
    R = Rr + Rc  # upper-triangle rows + mirrored lower-triangle columns
    s = jnp.maximum(jnp.exp(loga + (f - S) / eps32), _SUM_FLOOR)
    if p == 2:
        dx = u[:, None] * (x32 - R / s[:, None])
    else:
        dx = u[:, None] * (x32 * (R[:, :1] / s[:, None])
                           - R[:, 1:] / s[:, None])
    return (
        dx.astype(x.dtype),
        jnp.zeros_like(f),
        jnp.zeros_like(loga),
        jnp.zeros_like(jnp.asarray(eps)),
        None, None,
    )


_softmin_extrap_walk_banded_sym_p.defvjp(
    _softmin_extrap_walk_banded_sym_fwd, _softmin_extrap_walk_banded_sym_bwd
)


# ==============================================================================
#  Differentiable truncated softmin
# ==============================================================================


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _lse_sparse_diff(x, y, h, eps, cols, counts, colsT, countsT, p, block):
    return lse_sparse(
        x, y, h, eps, cols, counts, p=p, block_n=block, block_m=block
    )


def _lse_sparse_fwd(x, y, h, eps, cols, counts, colsT, countsT, p, block):
    out = lse_sparse(
        x, y, h, eps, cols, counts, p=p, block_n=block, block_m=block
    )
    return out, (x, y, h, eps, cols, counts, colsT, countsT, out)


def _lse_sparse_bwd(p, block, res, u):
    # Same analytic VJP as the dense streaming softmin
    # (ops/softmin.py::_lse_points_bwd), restricted to the kept tiles.
    x, y, h, eps, cols, counts, colsT, countsT, out = res
    phi = -out
    psi = h
    kind = "gibbs" if p == 2 else "gibbs_grad"

    ones_y = jnp.ones((y.shape[0], 1), dtype=y.dtype)
    Vy = jnp.concatenate([ones_y, y], axis=-1)
    R = gibbs_apply_sparse(
        x, y, phi, psi, Vy, eps, cols, counts,
        p=p, kind=kind, block_n=block, block_m=block,
    )
    dx = -(u / eps)[:, None] * (x * R[:, :1] - R[:, 1:])

    ones_x = jnp.ones((x.shape[0], 1), dtype=x.dtype)
    Vx = u[:, None] * jnp.concatenate([ones_x, x], axis=-1)
    Tq = gibbs_apply_sparse(
        y, x, psi, phi, Vx, eps, colsT, countsT,
        p=p, kind=kind, block_n=block, block_m=block,
    )
    dy = -(1.0 / eps) * (y * Tq[:, :1] - Tq[:, 1:])

    if p == 1:
        t = gibbs_apply_sparse(
            y, x, psi, phi, u[:, None], eps, colsT, countsT,
            p=p, kind="gibbs", block_n=block, block_m=block,
        )
        dh = t[:, 0]
    else:
        dh = Tq[:, 0]

    return (
        dx.astype(x.dtype),
        dy.astype(y.dtype),
        dh.astype(h.dtype),
        jnp.zeros_like(jnp.asarray(eps)),
        None,
        None,
        None,
        None,
    )


_lse_sparse_diff.defvjp(_lse_sparse_fwd, _lse_sparse_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def softmin_extrapolation_sparse_dir(
    x, y, f, g, loga, logb, eps, cols, counts, p, block
):
    r"""One direction of the truncated differentiable last extrapolation:
    the absorbed softmin over the rows of ``x``, with gradient flowing to
    ``x`` only (detached-cost convention, reference
    ``_legacy/sinkhorn_samples.py:179-185`` — the column cloud and all
    potentials are constants).

    The row-sharded (multi-chip) fine phase uses this for both directions
    — each orientation is row-local to a device shard, and the detached
    convention means no cross-device cotangents exist.
    """
    eps32 = jnp.asarray(eps, jnp.float32)
    phi = loga + f / eps32
    psi = logb + g / eps32
    r = _absorbed_sum(x, y, phi, psi, eps32, cols, counts, p, block)
    return (f + eps32 * (loga - jnp.log(r))).astype(f.dtype)


def _softmin_extrap_dir_fwd(x, y, f, g, loga, logb, eps, cols, counts, p, block):
    S = softmin_extrapolation_sparse_dir(
        x, y, f, g, loga, logb, eps, cols, counts, p, block
    )
    return S, (x, y, f, g, loga, logb, eps, cols, counts, S)


def _softmin_extrap_dir_bwd(p, block, res, u):
    x, y, f, g, loga, logb, eps, cols, counts, S = res
    dx = _extrap_dx_sparse(
        x, y, f, g, loga, logb, eps, S, u, cols, counts, p, block
    )
    z = jnp.zeros_like
    return (
        dx.astype(x.dtype),
        z(y), z(f), z(g), z(loga), z(logb),
        jnp.zeros_like(jnp.asarray(eps)),
        None, None,
    )


softmin_extrapolation_sparse_dir.defvjp(
    _softmin_extrap_dir_fwd, _softmin_extrap_dir_bwd
)


def lse_sparse_custom(x, y, h, eps, cols, counts, cost, block):
    """Truncated streaming LSE with a user-supplied cost callable.

    The Pallas kernels hard-wire the built-in ``|x-y|^p / p`` costs (the
    dot-expansion trick); custom costs instead run a gather-based XLA
    path: for each row tile, its kept column tiles are gathered into a
    packed block and the user callable ``cost((1, bn, D), (1, cap*bm, D))
    -> (1, bn, cap*bm)`` is evaluated on it — the truncation's pair-count
    saving is preserved without kernel codegen, and plain autodiff (with
    per-tile rematerialization) provides gradients. The reference's
    multiscale backend only accepts KeOps *formula strings* here
    (``_legacy/sinkhorn_samples.py:558,570-573``); any traced JAX callable
    works.
    """
    N, D = x.shape
    M, _ = y.shape
    nI, cap = cols.shape
    yt = y.reshape(M // block, block, D)
    ht = h.reshape(M // block, block)
    xt = x.reshape(nI, block, D)

    @jax.checkpoint
    def per_tile(args):
        xi, ci, ni = args
        yg = yt[ci].reshape(1, cap * block, D)  # (1, cap*bm, D) gather
        hg = ht[ci].reshape(-1)  # (cap*bm,)
        C = cost(xi[None], yg)[0]  # (bn, cap*bm)
        live = jnp.repeat(jnp.arange(cap) < ni, block)  # mask the frozen
        scores = jnp.where(live[None, :], hg[None, :] - C / eps, NEG_INF)
        # A user cost may compute in a wider dtype (e.g. f64 under x64);
        # the solver carry stays in the potentials' dtype:
        return jax.nn.logsumexp(scores, axis=-1).astype(h.dtype)

    return lax.map(per_tile, (xt, cols, counts)).reshape(-1)


def softmin_sparse(eps, C_xy, h, p=2, block=256):
    """Truncated softmin: drop-in for the multiscale fine phase.

    ``C_xy = (x, y, mask)`` where ``mask`` is a :class:`TileMask` for the
    (x-rows, y-cols) direction. The yx direction uses ``mask.transpose()``.
    """
    x, y, mask = C_xy
    eps = jnp.asarray(eps, dtype=jnp.float32)
    out = _lse_sparse_diff(
        x, y, h, eps, mask.cols, mask.counts, mask.colsT, mask.countsT, p, block
    )
    return -eps * out


# ==============================================================================
#  Differentiable truncated kernel matvec (MMD losses)
# ==============================================================================


def masks_from_geometry(x, y, radius, block, cap=None, w_x=None, w_y=None,
                        sym=False, stat_block=None):
    """Tile masks from a pure distance rule: keep tile pairs whose minimum
    possible pairwise distance (centroid distance minus radii) is below
    ``radius``. This is the rigorous version of the reference's
    MMD truncation (``_legacy/kernel_samples.py:242-256``: centroid
    distance <= (truncate + cell_diameter) in blur units). The bound is
    evaluated at ``stat_block`` sub-block granularity and min-pooled to
    tiles (see :func:`_stat_block`).

    Zero-weight (padding) tiles are never kept. ``sym=True`` declares the
    problem symmetric (``y is x``) so the transposed top-k is a free copy.
    """
    nI = x.shape[0] // block
    nJ = y.shape[0] // block
    if cap is None:
        cap = max(8, min(nJ // 8, 128))
    cap = min(cap, max(8, 400_000 // (4 * min(max(nI, nJ), MAX_TABLE_ROWS))))

    sb = stat_block if stat_block is not None else _stat_block(
        max(x.shape[0], y.shape[0]), block
    )
    bpt = block // sb
    cx, rx = tile_stats(x, sb)
    cy, ry = tile_stats(y, sb)
    d_lb = _pair_dist_lb(cx, rx, cy, ry)
    score = radius - d_lb  # > 0 <=> kept

    def blk_mass(w, nt):
        if w is None:
            return jnp.ones((nt,), bool)
        return (w.reshape(nt, sb) > 0).any(axis=1)

    valid = (
        blk_mass(w_x, x.shape[0] // sb)[:, None]
        & blk_mass(w_y, y.shape[0] // sb)[None, :]
    )
    score = jnp.where(valid, score, NEG_INF)
    score = _tile_maxpool(score, bpt)  # (nI, nJ)

    cols, counts, vals = _cols_from_score(score, cap)
    if sym:
        colsT, countsT, valsT = cols, counts, vals
    else:
        colsT, countsT, valsT = _cols_from_score(score.T, cap)
    return TileMask(
        cols=cols, counts=counts, colsT=colsT, countsT=countsT,
        vals=vals, valsT=valsT,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _kernel_matvec_sparse(x, y, v, eps, cols, counts, colsT, countsT, p, block):
    zx = jnp.zeros(x.shape[0], jnp.float32)
    zy = jnp.zeros(y.shape[0], jnp.float32)
    return gibbs_apply_sparse(
        x, y, zx, zy, v[:, None], eps, cols, counts,
        p=p, kind="gibbs", block_n=block, block_m=block,
    )[:, 0]


def _kernel_matvec_fwd(x, y, v, eps, cols, counts, colsT, countsT, p, block):
    out = _kernel_matvec_sparse(x, y, v, eps, cols, counts, colsT, countsT, p, block)
    return out, (x, y, v, eps, cols, counts, colsT, countsT, out)


def _kernel_matvec_bwd(p, block, res, u):
    # O_i = sum_j w_ij v_j with w_ij = exp(-C_p(x_i, y_j)/eps):
    #   dv_j    = sum_i w_ij u_i                       (transposed apply)
    #   dx_i    = -(u_i / eps) sum_j w'_ij v_j (x_i - y_j)
    #   dy_j    = -(1 / eps) sum_i w'_ij u_i (y_j - x_i)
    # where w' = w for p=2 and w/d for p=1 (gradient of the distance).
    x, y, v, eps, cols, counts, colsT, countsT, out = res
    D = x.shape[-1]
    zx = jnp.zeros(x.shape[0], jnp.float32)
    zy = jnp.zeros(y.shape[0], jnp.float32)
    kind = "gibbs" if p == 2 else "gibbs_grad"

    # Row side: R_i = sum_j w'_ij v_j [1, y_j]  -> (N, 1+D)
    Vy = v[:, None] * jnp.concatenate([jnp.ones((y.shape[0], 1), y.dtype), y], -1)
    R = gibbs_apply_sparse(
        x, y, zx, zy, Vy, eps, cols, counts,
        p=p, kind=kind, block_n=block, block_m=block,
    )
    dx = -(u / eps)[:, None] * (x * R[:, :1] - R[:, 1:])

    # Column side: T_j = sum_i w'_ij u_i [1, x_i]  -> (M, 1+D)
    Ux = u[:, None] * jnp.concatenate([jnp.ones((x.shape[0], 1), x.dtype), x], -1)
    T = gibbs_apply_sparse(
        y, x, zy, zx, Ux, eps, colsT, countsT,
        p=p, kind=kind, block_n=block, block_m=block,
    )
    dy = -(v / eps)[:, None] * (y * T[:, :1] - T[:, 1:])

    if p == 1:
        dv = gibbs_apply_sparse(
            y, x, zy, zx, u[:, None], eps, colsT, countsT,
            p=p, kind="gibbs", block_n=block, block_m=block,
        )[:, 0]
    else:
        dv = T[:, 0]

    return (
        dx.astype(x.dtype),
        dy.astype(y.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(jnp.asarray(eps)),
        None,
        None,
        None,
        None,
    )


_kernel_matvec_sparse.defvjp(_kernel_matvec_fwd, _kernel_matvec_bwd)


def kernel_matvec_sparse(x, y, v, eps, mask, p=2, block=512):
    """Differentiable truncated Gibbs-kernel matvec
    ``O_i = sum_j exp(-C_p(x_i,y_j)/eps) v_j`` over the kept tiles of
    ``mask`` (gaussian: p=2, eps=blur^2; laplacian: p=1, eps=blur)."""
    eps = jnp.asarray(eps, jnp.float32)
    return _kernel_matvec_sparse(
        x, y, v, eps, mask.cols, mask.counts, mask.colsT, mask.countsT, p, block
    )
