r"""Multiscale (coarse-to-fine) Sinkhorn with block-sparse kernel truncation.

Re-design of the reference's KeOps block-sparse backend
(``/root/reference/src/geomloss/_legacy/sinkhorn_samples.py:427-681``).

The reference clusterizes with a voxel grid: the number of clusters is
data-dependent and clusters are ragged — fine for KeOps' ranged CUDA
reductions, hostile to XLA. The TPU-native formulation:

1. points are sorted by voxel id at scale ``cluster_scale`` (static bin
   count derived from the static ``diameter``), then grouped into
   **fixed-size blocks** — every shape is static, so the whole solver
   jits and differentiates;
2. the coarse measure is the per-block weighted centroid with summed
   weights; the coarse epsilon-descent runs on it until
   ``eps < cluster_scale**p`` — the reference's jump rule (``:593-597``);
3. the jump extrapolates the potentials analytically onto the fine cloud
   (``extrapolate_samples``, ``:533-544``);
4. **kernel truncation** (``:493-530``): the extrapolated potentials give
   per-kernel-tile keep scores ``max f + max g > C_lb - truncate*eps``;
   the remaining fine iterations and the differentiable last
   extrapolation run through block-sparse Pallas kernels that only visit
   the kept tiles (see ``ops/block_sparse.py``). Pass ``truncate=None``
   for an exact (dense-streaming) fine phase.

Gradient semantics match the reference: everything up to the final
extrapolation is detached (envelope theorem).
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.block_sparse import (
    APPLY_BAND_TILES,
    MAX_APPLY_ROWS,
    build_tile_masks,
    lse_sparse_custom,
    masks_from_coarse,
    retighten_counts,
    sinkhorn_step_walk_banded,
    sinkhorn_step_walk_banded_sym,
    softmin_extrap_truncated,
    softmin_extrapolation_walk_banded,
    softmin_extrapolation_walk_banded_sym,
    walk_plan_banded,
)
from ..ops.softmin import (
    sinkhorn_step_points,
    softmin_extrapolation,
    softmin_extrapolation_sym,
    softmin_points,
)
from ..ops.spatial import hilbert_key, radix_sort_perm
from ..solvers.annealing import dampening, scaling_parameters
from ..solvers.sinkhorn_loop import log_weights, sinkhorn_cost

__all__ = [
    "sinkhorn_multiscale",
    "spatial_sort_blocks",
    "default_cluster_scale",
    "jump_index",
]

#: Kernel tile size of the block-sparse fine phase. Padded cloud sizes are
#: multiples of this, and the cluster block size divides it.
TILE = 512


def _cdiv(a, b):
    return -(-a // b)


def default_cluster_scale(diameter, D):
    """The reference's default coarse resolution: ~2000 clusters
    (``_legacy/sinkhorn_samples.py:583-584``)."""
    return diameter / (math.sqrt(D) * 2000 ** (1 / D))


def jump_index(eps_list, cluster_scale, p):
    """Index of the coarse-to-fine jump iteration: the first step (past the
    two warm-up iterations) whose temperature resolves the cluster scale,
    else the last iteration (``_legacy/sinkhorn_samples.py:592-597``)."""
    jump = len(eps_list) - 1
    for i, e in enumerate(eps_list[2:]):
        if cluster_scale**p > e:
            jump = i + 1
            break
    return jump


def kd_sort_perm(x, leaf_size):
    """Balanced KD ordering: recursively split (widest axis, median) until
    segments reach ``leaf_size``. Input length must be ``leaf_size * 2^k``.

    Unlike a space-filling curve, the resulting fixed-size tiles are
    near-optimally compact — the property the truncation bounds rely on.
    Fully jit-compatible: ``k`` levels of vmapped argsorts.
    """
    N, D = x.shape
    levels = 0
    while leaf_size << (levels + 1) <= N:
        levels += 1
    assert leaf_size << levels == N, "length must be leaf_size * 2^k"

    idx = jnp.arange(N)
    seg = 1
    for _ in range(levels):
        seg_len = N // seg
        xs = jnp.take_along_axis(x, idx[:, None], axis=0).reshape(seg, seg_len, D)
        width = xs.max(axis=1) - xs.min(axis=1)  # (seg, D)
        ax = jnp.argmax(width, axis=-1)  # (seg,)
        vals = jnp.take_along_axis(xs, ax[:, None, None], axis=2)[..., 0]
        order = jnp.argsort(vals, axis=1, stable=False)  # (seg, seg_len)
        idx = jnp.take_along_axis(idx.reshape(seg, seg_len), order, axis=1).reshape(-1)
        seg *= 2
    return idx


def spatial_sort_blocks(
    a, x, cluster_scale, diameter, block_size, pad_multiple=TILE, labels=None
):
    """KD-sort a measure and group it into fixed-size blocks.

    Returns ``(w_coarse, a_sorted), (centroids, x_sorted), perm`` where the
    sorted arrays are padded to ``pad_multiple * 2^k`` (padding has zero
    weight and sits in a far corner so it occupies dedicated tiles) and
    ``perm`` maps original -> position among the first N sorted slots.

    When integer ``labels`` are given (the reference's user-supplied
    clusters, ``_legacy/clustering.py``), points are ordered by
    (label, Hilbert index): blocks then respect label boundaries up to
    block granularity, so the coarse phase sees label-coherent clusters.
    """
    N, D = x.shape

    sg = lax.stop_gradient
    x_d = sg(x)

    # Pad to pad_multiple * 2^k with zero-weight duplicates of the last
    # point. Padding coordinates MUST stay in the data range: out-of-range
    # sentinels produce 1e5-scale exponents whose f32 cancellation NaNs the
    # folded Gibbs kernels. Zero-weight tiles are excluded from the
    # truncation masks by the mass checks, so in-range padding costs at
    # most one extra kept tile.
    Npad = pad_multiple
    while Npad < N:
        Npad *= 2
    if Npad != N:
        pad_pt = x_d[-1:]
        x_full = jnp.concatenate(
            [x, jnp.broadcast_to(pad_pt, (Npad - N, D))], axis=0
        )
        x_full_d = jnp.concatenate(
            [x_d, jnp.broadcast_to(pad_pt, (Npad - N, D))], axis=0
        )
        a_full = jnp.concatenate([a, jnp.zeros((Npad - N,), a.dtype)])
    else:
        x_full, x_full_d, a_full = x, x_d, a

    # Key resolution targets ~16 points per Hilbert cell: cells stay far
    # smaller than a cluster block (>= 256 points), so deeper bits only
    # refine the irrelevant order *inside* cells — and every 3 bits is
    # one more radix pass over the cloud (sort measured 205 ms/cloud of
    # a 4.0 s solve at 2M; 16 vs 4 points/cell drops 21 -> 18 key bits
    # at 2M/4M, one pass of three).
    bits = max(4, min(10, math.ceil(math.log2(max(Npad, 2) / 16) / D)))
    if labels is not None:
        # Stable two-pass composition: Hilbert order within each label.
        lab = jnp.concatenate(
            [
                jnp.asarray(labels, jnp.int32).reshape(-1),
                jnp.full((Npad - N,), 0, jnp.int32),
            ]
        ) if Npad != N else jnp.asarray(labels, jnp.int32).reshape(-1)
        perm1 = radix_sort_perm(
            hilbert_key(x_full_d, bits=bits), total_bits=D * bits
        )
        perm2 = radix_sort_perm(lab[perm1], total_bits=18)
        order = perm1[perm2]
    elif Npad > (1 << 12):
        # XLA's TPU sort lowers to a bitonic network whose compile time
        # explodes with size (558 s at N=10k measured): beyond a few
        # thousand points, order by Hilbert-curve keys with a linear-time
        # radix sort (slightly looser tiles, O(1) compile size):
        order = radix_sort_perm(
            hilbert_key(x_full_d, bits=bits), total_bits=D * bits
        )
    else:
        order = kd_sort_perm(x_full_d, min(block_size, pad_multiple))
    a_s = a_full[order]
    x_s = jnp.take_along_axis(x_full, order[:, None], axis=0)
    # perm maps sorted slot -> original index (pad slots point past N):
    perm = order

    K = Npad // block_size
    ab = sg(a_s).reshape(K, block_size)
    xb = sg(x_s).reshape(K, block_size, D)
    w = ab.sum(-1)  # (K,)
    cent = (ab[..., None] * xb).sum(1) / jnp.maximum(w, 1e-30)[:, None]
    return (w, a_s), (cent, x_s), perm


#: Largest point count whose fine truncation tables are known to hold the
#: full kept neighborhood at the jump temperature under the default cap
#: (verified against converged values on the 3D benchmark spheres).
#: Beyond it, the intermediate scale delays fine entry by
#: ``ceil(log(N / N_FINE_OK) / log(1 / scaling^p))`` annealing steps.
N_FINE_OK = 1 << 20

def mid_cap(n_pad, tile):
    """Static table width for the mid-path fine masks.

    Round 3 pinned this at 64 from a kept-count measurement taken with
    unrepresentative (zero) potentials; with the real extrapolated
    potentials the kept set at 2M / tile 1024 is mean 61.8, p99 93,
    max 128 at the first fine temperature (PROFILE_PHASES.jsonl) — cap 64
    was silently clipping 43% of rows, which is the ~9% loss shift the
    round-3 advisor flagged at 4M. The kept-tile count per row scales
    with the tile count (each tile covers half the area when N doubles at
    fixed tile size), so the width must scale with ``nJ``; the dead-step
    cost of the wide table is paid once per traversal and eliminated by
    the step-list walk kernels (``ops/block_sparse.py``). The SMEM clamp
    inside ``build_tile_masks`` (~219 at MAX_TABLE_ROWS) still binds
    last. Per-row overflow beyond the cap degrades to best-score top-k;
    audit a configuration with :func:`kept_tile_stats`.
    """
    nJ = n_pad // tile
    return min(224, max(96, nJ // 16))

#: Column-tile side of the truncated coarse/mid -> fine extrapolation
#: sweeps (``ops/block_sparse.py::softmin_extrap_truncated``): small tiles
#: track the keep radius on the *source* cloud, whose spatial extent per
#: tile is much larger than a fine kernel tile's.
EXTRAP_BM = 128

#: Test/debug hook: force the intermediate-scale pooling factor.
_B_MID_OVERRIDE = None

#: Debug hook: return the fine-entry state just before the fine tables
#: are built (mask-construction and kernel-equivalence analysis on real
#: hardware, where io_callback/debug.print are unavailable). Fires on
#: any solve with a fine phase (whether or not the intermediate scale
#: ran); the "mid" keys hold the extrapolation-source cloud (coarse when
#: ``n_delay == 0``).
_DEBUG_MID_STATE = False


def auto_tile(n_max):
    """Kernel-tile side for an ``n_max``-point problem.

    Small tiles track the truncation radius tightly (fewer visited pairs)
    but cost ~0.5 us of scalar-core bookkeeping per grid step; measured on
    v5e the sweet spot is 512 up to ~512k points and 1024 beyond. The SMEM
    scalar-prefetch budget no longer binds: tables with more than
    ``MAX_TABLE_ROWS`` rows are split into per-chunk launches inside the
    sparse kernels (``ops/block_sparse.py::_launch_chunked``) — round 2
    had to grow the tile to 4096 at N = 4e6 instead, which visited ~9x
    the ideal pair count. The chunk count is capped at 8 (beyond ~8M
    points the tile grows again).
    """
    npad = 1 << max(int(np.ceil(np.log2(max(n_max, 2)))), 0)
    if npad <= (1 << 19):
        return TILE
    tile = 1024
    while npad // tile > 8192:
        tile *= 2
    return tile


def fine_cap_schedule(eps_fine, eps_j, cap0):
    """Group consecutive fine temperatures sharing a static tile-table cap.

    Sparse-grid steps cost ~1 us each *even when compute-gated*, so the
    static ``cap`` must track the true kept counts: the keep radius is
    ``~ sqrt(truncate * eps)`` and kept-tile counts shrink at least
    linearly in eps on <= 2-dim data (the reference's multiscale domain),
    so the cap scales as ``cap0 * eps / eps_jump`` (floored at 24 for the
    tile-radius slack that dominates at small N; overflow degrades to
    best-score top-k, like the build cap).

    Returns:
        List of ``(cap, [eps, ...])`` groups in descent order.
    """

    def cap_for(e):
        raw = int(np.ceil(cap0 * (e / eps_j)))
        return min(cap0, max(24, -(-raw // 8) * 8))  # multiple of 8

    groups = []
    for e in eps_fine:
        ck = cap_for(e)
        if groups and groups[-1][0] == ck:
            groups[-1][1].append(e)
        else:
            groups.append((ck, [e]))
    return groups


def fine_warmup(cluster_scale, p, eps_target):
    """Extra fine iterations at the entry temperature when the target blur
    resolves far below the cluster scale (``eps_target = blur**p``). Zero
    at the default blur=.05 3D setup (ratio ~3.4); two at blur=.01
    (ratio ~84), where they wash out the coarse warm-start bias."""
    return 2 if cluster_scale**p > 50 * eps_target else 0


def mid_delay(n_max, eps_list, jump, scaling, p):
    """Number of post-jump annealing steps to spend on the pooled
    intermediate scale (0 = classic two-scale descent).

    The fine truncation tables hold at most ``cap`` (<= 128) column tiles
    per row tile; at the jump temperature the kept neighborhood covers a
    *fixed fraction* of the cloud (the keep radius ``~ sqrt(truncate *
    cluster_scale^p)`` and the default cluster scale are both
    N-independent), so beyond ~1M points the table would clip real
    neighbors and bias the loss. Each annealing step shrinks the kept
    fraction by ``scaling^p``: delaying fine entry by ``n_delay`` steps
    keeps visited fine pairs per point bounded as N grows — the cascade
    the reference hints at but never implements (its two-scale loop at
    ``_legacy/sinkhorn_samples.py:622-651`` has the same clipping issue
    under KeOps ranges, reported as "millions of samples" reach).
    """
    if n_max <= N_FINE_OK:
        return 0
    sp = float(scaling) ** p
    n_delay = int(np.ceil(np.log(n_max / N_FINE_OK) / np.log(1.0 / sp)))
    return min(n_delay, len(eps_list) - 1 - jump)


def run_mid_phase(
    sm,
    carry,
    x_cd,
    y_cd,
    a_log_c,
    b_log_c,
    a_s,
    b_s,
    x_sd,
    y_sd,
    eps_list,
    jump,
    n_delay,
    rho,
    debias,
    dtype,
    block_size,
    scaling,
    verbose=False,
):
    """Pooled intermediate-scale phase between the coarse and fine scales.

    Runs the first ``n_delay`` post-jump temperatures on a cloud of
    pooled mid-blocks (dense streaming sweeps on <= ~2^16 points —
    microseconds of MXU work). Entirely detached: the mid phase is never
    the differentiable tail. Returns the updated potential ``carry`` plus
    the mid cloud ``(x_md, y_md, a_log_m, b_log_m)`` that replaces the
    coarse state for the subsequent fine extrapolation/truncation.
    """
    sg = lax.stop_gradient
    f_ba, g_ab, f_aa, g_bb = carry
    D = x_sd.shape[1]
    eps_j = eps_list[jump]
    damp_j = dampening(eps_j, rho)

    # Mid resolution: pooled blocks whose spatial extent tracks the
    # entry temperature (diameter ~ sqrt(points) on a 2D manifold, the
    # reference's stated regime): b_mid <= block_size * scaling^(2 n).
    b_mid = 1 << max(
        0,
        int(np.floor(np.log2(block_size * float(scaling) ** (2 * n_delay)))),
    )
    if _B_MID_OVERRIDE is not None:
        b_mid = _B_MID_OVERRIDE

    def pool_mid(w, pts):
        wb = w.reshape(-1, b_mid)
        pb = pts.reshape(-1, b_mid, D)
        wsum = wb.sum(1)
        cent = (pb * wb[..., None]).sum(1) / jnp.maximum(wsum, 1e-30)[:, None]
        # Zero-mass (padding) blocks: park at the plain mean.
        return wsum, jnp.where(wsum[:, None] > 0, cent, pb.mean(1))

    aw_m, x_m = pool_mid(sg(a_s), x_sd)
    bw_m, y_m = pool_mid(sg(b_s), y_sd)
    a_log_m, b_log_m = log_weights(aw_m), log_weights(bw_m)
    x_md, y_md = sg(x_m), sg(y_m)

    if verbose:
        print(
            f"Intermediate scale: {x_m.shape[0]}x{y_m.shape[0]} pooled "
            f"blocks of {b_mid} for {n_delay} iteration(s) after the jump."
        )

    # Extrapolate coarse -> mid (detached):
    f_ba_m = damp_j * sm(eps_j, (x_md, y_cd), sg(b_log_c + g_ab / eps_j))
    g_ab_m = damp_j * sm(eps_j, (y_md, x_cd), sg(a_log_c + f_ba / eps_j))
    if debias:
        f_aa_m = damp_j * sm(eps_j, (x_md, x_cd), sg(a_log_c + f_aa / eps_j))
        g_bb_m = damp_j * sm(eps_j, (y_md, y_cd), sg(b_log_c + g_bb / eps_j))
    else:
        f_aa_m = jnp.zeros_like(f_ba_m)
        g_bb_m = jnp.zeros_like(g_ab_m)

    mid_fns = (
        lambda e, h: sm(e, (x_md, y_md), h),
        lambda e, h: sm(e, (y_md, x_md), h),
        lambda e, h: sm(e, (x_md, x_md), h),
        lambda e, h: sm(e, (y_md, y_md), h),
    )
    carry = _scan_iterations(
        mid_fns,
        (f_ba_m, g_ab_m, f_aa_m, g_bb_m),
        eps_list[jump + 1 : jump + n_delay + 1],
        rho,
        (a_log_m, b_log_m),
        debias,
        dtype,
    )
    return carry, x_md, y_md, a_log_m, b_log_m


def _scan_iterations(
    softmin_fns, carry, eps_seg, rho, h_builders, debias, dtype, fused=None,
    fused_xs=None,
):
    """Generic symmetric-update scan: softmin_fns/h_builders describe the
    four problems (xy, yx, xx, yy). When ``fused = (pair, sym_x, sym_y)``
    is given, each iteration runs on fused single-pass absorbed steps
    (both cross directions from one mask traversal pair) instead of four
    two-pass softmin sweeps."""
    sm_xy, sm_yx, sm_xx, sm_yy = softmin_fns
    eps_arr = jnp.asarray(eps_seg, dtype=dtype)
    damp_arr = jnp.asarray([dampening(e, rho) for e in eps_seg], dtype=dtype)
    a_log, b_log = h_builders

    def body(carry, inp):
        if fused is not None and fused_xs is not None:
            eps, damp, extra = inp
        else:
            (eps, damp), extra = inp, None
        f_ba, g_ab, f_aa, g_bb = carry
        if fused is not None:
            pair, sym_x, sym_y = fused
            S_xy, S_yx = pair(eps, f_ba, g_ab, extra)
            ft_ba, gt_ab = damp * S_xy, damp * S_yx
            if debias:
                ft_aa = damp * sym_x(eps, f_aa, extra)
                gt_bb = damp * sym_y(eps, g_bb, extra)
        else:
            ft_ba = damp * sm_xy(eps, b_log + g_ab / eps)
            gt_ab = damp * sm_yx(eps, a_log + f_ba / eps)
            if debias:
                ft_aa = damp * sm_xx(eps, a_log + f_aa / eps)
                gt_bb = damp * sm_yy(eps, b_log + g_bb / eps)
        f_ba = 0.5 * (f_ba + ft_ba)
        g_ab = 0.5 * (g_ab + gt_ab)
        if debias:
            f_aa = 0.5 * (f_aa + ft_aa)
            g_bb = 0.5 * (g_bb + gt_bb)
        return (f_ba, g_ab, f_aa, g_bb), None

    xs = (eps_arr, damp_arr)
    if fused is not None and fused_xs is not None:
        xs = (eps_arr, damp_arr, fused_xs)
    carry, _ = lax.scan(body, carry, xs)
    return carry


def sinkhorn_multiscale(
    a,
    x,
    b,
    y,
    p=2,
    blur=0.05,
    reach=None,
    diameter=None,
    scaling=0.5,
    truncate=5,
    cost=None,
    cluster_scale=None,
    debias=True,
    potentials=False,
    labels_x=None,
    labels_y=None,
    verbose=False,
    impl="auto",
    block_size="auto",
    cap=None,
    target_clusters=2000,
    tile="auto",
    **kwargs,
):
    """Two-scale Sinkhorn divergence on unbatched clouds ``x (N,D)``, ``y (M,D)``.

    Fully jit- and grad-compatible (pass ``diameter=`` under tracing).
    ``truncate`` controls the block-sparse pruning margin (reference
    default 5); ``truncate=None`` disables pruning (exact fine phase).
    ``cap`` bounds the number of visited column tiles per row tile
    (default: a sixteenth of the tiles, at least 8).
    """
    N, D = x.shape
    M, _ = y.shape

    diameter, eps, eps_list, rho = scaling_parameters(
        x, y, p, blur, reach, diameter, scaling
    )

    if cluster_scale is None:
        cluster_scale = default_cluster_scale(diameter, D)

    if tile == "auto":
        tile = auto_tile(max(N, M))

    if block_size == "auto":
        # Largest power-of-two divisor of the tile that keeps >= target_clusters
        # coarse blocks (mirrors the reference's ~2000-cluster target):
        block_size = 1
        while (
            block_size * 2 <= tile
            and max(N, M) // (block_size * 2) >= target_clusters
        ):
            block_size *= 2

    (aw_c, a_s), (x_c, x_s), perm_x = spatial_sort_blocks(
        a, x, cluster_scale, diameter, block_size, pad_multiple=tile,
        labels=labels_x,
    )
    (bw_c, b_s), (y_c, y_s), perm_y = spatial_sort_blocks(
        b, y, cluster_scale, diameter, block_size, pad_multiple=tile,
        labels=labels_y,
    )

    # Jump index (reference ``:593-597``):
    jump = jump_index(eps_list, cluster_scale, p)

    if verbose:
        print(
            f"{x_c.shape[0]}x{y_c.shape[0]} cluster blocks, computed at "
            f"scale = {cluster_scale:2.3f}"
        )
        print(
            "Successive scales : ",
            ", ".join(f"{e ** (1 / p):.3f}" for e in eps_list),
        )
        print(f"Jump from coarse to fine after iteration {jump}.")

    sg = lax.stop_gradient
    dtype = x_s.dtype
    a_log_c, b_log_c = log_weights(aw_c), log_weights(bw_c)
    a_log_f, b_log_f = log_weights(a_s), log_weights(b_s)

    # Custom costs (reference capability, KeOps formula strings upstream —
    # ``_legacy/sinkhorn_samples.py:558,570-573``; any traced JAX callable
    # here): the coarse phase and extrapolations stream through the
    # chunked custom-cost softmin, truncation scores evaluate the user
    # cost between block centroids exactly like the reference, and the
    # fine phase runs a gather-based truncated LSE. Clustering stays
    # Euclidean (so does the reference's voxel grid_cluster).
    sm = partial(softmin_points, p=p, impl=impl, cost=cost)
    x_cd, y_cd = sg(x_c), sg(y_c)
    x_sd, y_sd = sg(x_s), sg(y_s)

    # --- Coarse phase (detached) ------------------------------------------------
    eps0 = eps_list[0]
    damp0 = dampening(eps0, rho)
    g_ab = damp0 * sm(eps0, (y_cd, x_cd), a_log_c)
    f_ba = damp0 * sm(eps0, (x_cd, y_cd), b_log_c)
    if debias:
        f_aa = damp0 * sm(eps0, (x_cd, x_cd), a_log_c)
        g_bb = damp0 * sm(eps0, (y_cd, y_cd), b_log_c)
    else:
        f_aa, g_bb = jnp.zeros_like(f_ba), jnp.zeros_like(g_ab)

    coarse_fns = (
        lambda e, h: sm(e, (x_cd, y_cd), h),
        lambda e, h: sm(e, (y_cd, x_cd), h),
        lambda e, h: sm(e, (x_cd, x_cd), h),
        lambda e, h: sm(e, (y_cd, y_cd), h),
    )
    carry = _scan_iterations(
        coarse_fns,
        (f_ba, g_ab, f_aa, g_bb),
        eps_list[: jump + 1],
        rho,
        (a_log_c, b_log_c),
        debias,
        dtype,
    )
    f_ba, g_ab, f_aa, g_bb = carry

    eps_j = eps_list[jump]
    damp_j = dampening(eps_j, rho)
    last_is_jump = jump == len(eps_list) - 1

    # --- Optional intermediate scale (third scale, round-3 extension) ----------
    # See :func:`mid_delay` / :func:`run_mid_phase`.
    n_delay = 0
    if truncate is not None and not last_is_jump and cost is None:
        n_delay = mid_delay(max(N, M), eps_list, jump, scaling, p)

    if n_delay > 0:
        (f_ba, g_ab, f_aa, g_bb), x_md, y_md, a_log_m, b_log_m = run_mid_phase(
            sm,
            (f_ba, g_ab, f_aa, g_bb),
            x_cd,
            y_cd,
            a_log_c,
            b_log_c,
            a_s,
            b_s,
            x_sd,
            y_sd,
            eps_list,
            jump,
            n_delay,
            rho,
            debias,
            dtype,
            block_size,
            scaling,
            verbose=verbose,
        )

        # Rebase the jump onto the mid scale: the generic fine
        # extrapolation and truncation below now read mid-level state.
        jump = jump + n_delay
        eps_j = eps_list[jump]
        damp_j = dampening(eps_j, rho)
        last_is_jump = jump == len(eps_list) - 1
        x_cd, y_cd = x_md, y_md
        a_log_c, b_log_c = a_log_m, b_log_m

    # --- Extrapolation to the fine cloud (reference ``:533-544``) ---------------
    # The cross-updates must use the *previous* iterates in parallel.
    # On the last-iteration jump, gradients flow through the fine points.
    # The detached sweeps are themselves truncated (round 4): the dense
    # ``N x M_src`` extrapolation was the dominant superlinear phase at
    # 2M-4M (4 x 110 ms of 3.47 s at 2M, PROFILE_PHASES.jsonl) — only
    # source tiles within the LSE keep margin of a fine row tile matter.
    x_e = x_s if last_is_jump else x_sd
    y_e = y_s if last_is_jump else y_sd

    def _extrap(rows, src, h):
        h = sg(h)
        ns = src.shape[0]
        if (
            truncate is not None
            and not last_is_jump
            and n_delay > 0
            and ns % EXTRAP_BM == 0
            and ns // EXTRAP_BM >= 64
        ):
            cap_e = max(8, min(64, -(-(ns // EXTRAP_BM) // 4 // 8) * 8))
            return softmin_extrap_truncated(
                rows, src, h, eps_j, truncate, tile, p=p,
                block_m=EXTRAP_BM, cap=cap_e,
            )
        return sm(eps_j, (rows, src), h)

    f_ba_f = damp_j * _extrap(x_e, y_cd, b_log_c + g_ab / eps_j)
    g_ab_f = damp_j * _extrap(y_e, x_cd, a_log_c + f_ba / eps_j)
    if debias:
        f_aa_f = damp_j * _extrap(x_e, x_cd, a_log_c + f_aa / eps_j)
        g_bb_f = damp_j * _extrap(y_e, y_cd, b_log_c + g_bb / eps_j)
    else:
        f_aa_f, g_bb_f = jnp.zeros_like(f_ba_f), jnp.zeros_like(g_ab_f)

    if _DEBUG_MID_STATE and not last_is_jump:
        return dict(
            x_sd=x_sd, y_sd=y_sd, f_ba_f=f_ba_f, g_ab_f=g_ab_f,
            f_aa_f=f_aa_f, g_bb_f=g_bb_f,
            a_s=a_s, b_s=b_s, eps_j=eps_j, tile=tile, jump=jump,
            eps_list=list(eps_list),
            # Mid-scale cloud (the dense-extrapolation source state):
            x_md=x_cd, y_md=y_cd, a_log_m=a_log_c, b_log_m=b_log_c,
            f_ba_m=f_ba, g_ab_m=g_ab, f_aa_m=f_aa, g_bb_m=g_bb,
        )

    if not last_is_jump and cost is not None:
        # --- Custom-cost fine phase --------------------------------------------
        eps_fine = list(eps_list[jump + 1:])
        eps_fine = [eps_fine[0]] * fine_warmup(cluster_scale, p, eps) \
            + eps_fine
        if truncate is not None:
            bpt = tile // block_size
            mask_xy = masks_from_coarse(
                x_cd, y_cd, f_ba, g_ab, aw_c, bw_c, eps_j, p, truncate, bpt,
                cap=cap, cost=cost,
            )
            if debias:
                mask_xx = masks_from_coarse(
                    x_cd, x_cd, f_aa, f_aa, aw_c, aw_c, eps_j, p, truncate,
                    bpt, cap=cap, sym=True, cost=cost,
                )
                mask_yy = masks_from_coarse(
                    y_cd, y_cd, g_bb, g_bb, bw_c, bw_c, eps_j, p, truncate,
                    bpt, cap=cap, sym=True, cost=cost,
                )

            def _cnt(vals, e):
                return jnp.minimum(
                    retighten_counts(vals, truncate * (e - eps_j)),
                    vals.shape[1],
                )

            def _lse_c(rows, src, h, e, cols, cnt):
                return -e * lse_sparse_custom(
                    rows, src, h, e, cols, cnt, cost, tile
                )

            fns = (
                lambda e, f, g, t: (
                    _lse_c(x_sd, y_sd, b_log_f + g / e, e,
                           mask_xy.cols, _cnt(mask_xy.vals, e)),
                    _lse_c(y_sd, x_sd, a_log_f + f / e, e,
                           mask_xy.colsT, _cnt(mask_xy.valsT, e)),
                ),
                (
                    lambda e, f, t: _lse_c(
                        x_sd, x_sd, a_log_f + f / e, e,
                        mask_xx.cols, _cnt(mask_xx.vals, e),
                    )
                ) if debias else None,
                (
                    lambda e, g, t: _lse_c(
                        y_sd, y_sd, b_log_f + g / e, e,
                        mask_yy.cols, _cnt(mask_yy.vals, e),
                    )
                ) if debias else None,
            )

            def run_fine_groups(carry):
                return _scan_iterations(
                    (None, None, None, None), carry, eps_fine, rho,
                    (a_log_f, b_log_f), debias, dtype, fused=fns,
                )

            def fused_extrap(eps_last, f_ba_f, g_ab_f, f_aa_f, g_bb_f):
                S_xy = _lse_c(
                    x_s, y_sd, sg(b_log_f + g_ab_f / eps_last), eps_last,
                    mask_xy.cols, _cnt(mask_xy.vals, eps_last),
                )
                S_yx = _lse_c(
                    y_s, x_sd, sg(a_log_f + f_ba_f / eps_last), eps_last,
                    mask_xy.colsT, _cnt(mask_xy.valsT, eps_last),
                )
                if debias:
                    S_xx = _lse_c(
                        x_s, x_sd, sg(a_log_f + f_aa_f / eps_last), eps_last,
                        mask_xx.cols, _cnt(mask_xx.vals, eps_last),
                    )
                    S_yy = _lse_c(
                        y_s, y_sd, sg(b_log_f + g_bb_f / eps_last), eps_last,
                        mask_yy.cols, _cnt(mask_yy.vals, eps_last),
                    )
                else:
                    S_xx = S_yy = None
                return S_xy, S_yx, S_xx, S_yy

        else:
            fine_fns = (
                lambda e, h: sm(e, (x_sd, y_sd), h),
                lambda e, h: sm(e, (y_sd, x_sd), h),
                lambda e, h: sm(e, (x_sd, x_sd), h),
                lambda e, h: sm(e, (y_sd, y_sd), h),
            )

            def run_fine_groups(carry):
                return _scan_iterations(
                    fine_fns, carry, eps_fine, rho,
                    (a_log_f, b_log_f), debias, dtype,
                )

            def fused_extrap(eps_last, f_ba_f, g_ab_f, f_aa_f, g_bb_f):
                S_xy = sm(eps_last, (x_s, y_sd), sg(b_log_f + g_ab_f / eps_last))
                S_yx = sm(eps_last, (y_s, x_sd), sg(a_log_f + f_ba_f / eps_last))
                if debias:
                    S_xx = sm(eps_last, (x_s, x_sd), sg(a_log_f + f_aa_f / eps_last))
                    S_yy = sm(eps_last, (y_s, y_sd), sg(b_log_f + g_bb_f / eps_last))
                else:
                    S_xx = S_yy = None
                return S_xy, S_yx, S_xx, S_yy

        # --- Fine iterations (detached) + differentiable extrapolation --------
        f_ba_f, g_ab_f, f_aa_f, g_bb_f = run_fine_groups(
            (f_ba_f, g_ab_f, f_aa_f, g_bb_f)
        )
        eps_last = eps_list[-1]
        damp = dampening(eps_last, rho)
        S_xy, S_yx, S_xx, S_yy = fused_extrap(
            eps_last, f_ba_f, g_ab_f, f_aa_f, g_bb_f
        )
        f_ba_f, g_ab_f = damp * S_xy, damp * S_yx
        if debias:
            f_aa_f, g_bb_f = damp * S_xx, damp * S_yy

    elif not last_is_jump:
        # --- Kernel truncation: tile masks from the extrapolated potentials ----
        if truncate is not None:
            if n_delay > 0:
                # The mid phase already landed the potentials on the fine
                # cloud: the keep rule reads tile-pooled fine potentials
                # against tile-geometry cost bounds. The tables only ever
                # serve the FINE iterations, so they are built at the
                # first fine temperature (round 4) — building at the
                # warmer mid-entry eps_j over-kept tiles and wasted cap
                # width on entries the fine phase immediately
                # re-thresholded away.
                eps_b = eps_list[jump + 1]
                cap_m = cap if cap is not None else mid_cap(
                    x_sd.shape[0], tile
                )
                a_w, b_w = sg(a_s), sg(b_s)
                mask_xy = build_tile_masks(
                    x_sd, y_sd, sg(f_ba_f), sg(g_ab_f), eps_b, p, truncate,
                    tile, cap=cap_m, w_x=a_w, w_y=b_w,
                )
                if debias:
                    mask_xx = build_tile_masks(
                        x_sd, x_sd, sg(f_aa_f), sg(f_aa_f), eps_b, p, truncate,
                        tile, cap=cap_m, w_x=a_w, w_y=a_w, sym=True,
                    )
                    mask_yy = build_tile_masks(
                        y_sd, y_sd, sg(g_bb_f), sg(g_bb_f), eps_b, p, truncate,
                        tile, cap=cap_m, w_x=b_w, w_y=b_w, sym=True,
                    )
                if verbose and not isinstance(
                    mask_xy.counts, jax.core.Tracer
                ):
                    # Eager-mode capacity audit (the overflow counter the
                    # round-3 advisor asked for; under jit the counts are
                    # tracers and the table width is the only guarantee):
                    ov = int((mask_xy.vals[:, -1] > 0).sum())
                    print(
                        f"Fine tables: cap={cap_m}, kept tiles/row mean "
                        f"{float(mask_xy.counts.mean()):.1f} / max "
                        f"{int(mask_xy.counts.max())}; {ov} of "
                        f"{mask_xy.counts.shape[0]} rows at capacity"
                        + (" (top-k clipping active)." if ov else ".")
                    )
            else:
                # Pointwise keep rule on the coarse potentials/centroids at
                # jump time (reference ``kernel_truncation``), pooled to
                # kernel tiles:
                bpt = tile // block_size
                mask_xy = masks_from_coarse(
                    x_cd, y_cd, f_ba, g_ab, aw_c, bw_c, eps_j, p, truncate, bpt,
                    cap=cap,
                )
                if debias:
                    mask_xx = masks_from_coarse(
                        x_cd, x_cd, f_aa, f_aa, aw_c, aw_c, eps_j, p, truncate,
                        bpt, cap=cap, sym=True,
                    )
                    mask_yy = masks_from_coarse(
                        y_cd, y_cd, g_bb, g_bb, bw_c, bw_c, eps_j, p, truncate,
                        bpt, cap=cap, sym=True,
                    )

            # The keep-score order is temperature-independent (the score
            # moves by a uniform truncate*(eps'-eps_jump)), so the same
            # cols tables serve every fine iteration with re-thresholded
            # counts — later (colder) iterations visit strictly fewer
            # tiles. The reference truncates once at the jump; this is
            # the same rule applied at each step's own temperature. To
            # also shrink the *grid* (skipped steps still cost a pipeline
            # step), the tables are sliced to a static per-eps cap
            # ~ cap * sqrt(eps/eps_jump) — conservative, since the keep
            # radius scales as sqrt(truncate*eps) and kept tiles grow at
            # least linearly in it; overflows degrade to best-score top-k
            # exactly like the global cap.
            eps_fine = list(eps_list[jump + 1:])
            # Tiny blurs resolve far below the cluster scale: the coarse
            # warm-start error then survives the few single-pass fine
            # iterations and biases the value (~29% of the debiased value
            # at blur .01 / scaling .5, committed BENCH_ACCURACY rows).
            # Spend extra iterations at the fine-entry temperature — each
            # averaged update halves the leftover coarse offset, and the
            # entry temperature is exactly the scale of the discrepancy:
            eps_fine = [eps_fine[0]] * fine_warmup(cluster_scale, p, eps) \
                + eps_fine
            cap0 = mask_xy.cols.shape[1]
            # Temperature the tables were built at (the retighten deltas
            # are relative to it): first fine eps on the mid path, jump
            # eps on the classic path.
            eps_m = eps_list[jump + 1] if n_delay > 0 else eps_j

            # Group consecutive fine iterations sharing a static cap; each
            # group runs as one scan over its (eps, damp, step-table)
            # stack. Every traversal goes through the step-list walk
            # (round 4): the grid size tracks the kept count per chunk.
            groups = fine_cap_schedule(eps_fine, eps_m, cap0)

            nI_f = x_sd.shape[0] // tile
            nJ_f = y_sd.shape[0] // tile

            def plans_banded(mask, ck, d, n_col, band_tiles=None,
                             tri=False):
                # One band-major table serves BOTH reduction directions
                # of the asymmetric step (round 4): half the traversals
                # of the (tbl, tblT) pair above. The step budget is the
                # FULL per-row cap: counts are tracers under jit, and any
                # data-dependent proportional clip silently drops kept
                # tiles (round 4 shipped t_mean = 5*cap/8, which clipped
                # ~20% of the 1M kept set and shifted the committed loss
                # 7.4x — the round-5 root cause). Dead steps are gated
                # (no DMA, ~0.5 us each): the safety margin costs a few
                # ms per sweep, never correctness.
                cnt = jnp.minimum(retighten_counts(mask.vals, d), ck)
                kw = {}
                if band_tiles is not None:
                    # Apply-banded tables: the dual apply kernel's larger
                    # accumulators also shrink its row chunks.
                    kw = {"band_tiles": band_tiles,
                          "rows_chunk": MAX_APPLY_ROWS}
                return walk_plan_banded(
                    mask.cols[:, :ck], cnt, ck, n_col, tri=tri, **kw
                )

            def run_fine_groups(carry):
                for ck, es in groups:
                    ds = [truncate * (e - eps_m) for e in es]
                    xs = {
                        "xy": jnp.stack(
                            [plans_banded(mask_xy, ck, d, nJ_f)
                             for d in ds]
                        )
                    }
                    if debias:
                        # Symmetric problems run the TRIANGLE banded
                        # tables (col >= row, mirrored column sums):
                        # half the pair visits of the full sym walk.
                        # mask_xx columns index x tiles, mask_yy's y
                        # tiles — each gets its own column-tile count.
                        xs["xx"] = jnp.stack(
                            [plans_banded(mask_xx, ck, d, nI_f, tri=True)
                             for d in ds]
                        )
                        xs["yy"] = jnp.stack(
                            [plans_banded(mask_yy, ck, d, nJ_f, tri=True)
                             for d in ds]
                        )
                    fns = (
                        lambda e, f, g, t: sinkhorn_step_walk_banded(
                            e, x_sd, y_sd, a_log_f, b_log_f, f, g,
                            t["xy"], p=p, block=tile,
                        ),
                        (
                            lambda e, f, t: sinkhorn_step_walk_banded_sym(
                                e, x_sd, a_log_f, f, t["xx"], p=p,
                                block=tile,
                            )
                        ) if debias else None,
                        (
                            lambda e, g, t: sinkhorn_step_walk_banded_sym(
                                e, y_sd, b_log_f, g, t["yy"], p=p,
                                block=tile,
                            )
                        ) if debias else None,
                    )
                    carry = _scan_iterations(
                        (None, None, None, None), carry, es, rho,
                        (a_log_f, b_log_f), debias, dtype,
                        fused=fns, fused_xs=xs,
                    )
                return carry

            ck_l = groups[-1][0]
            d_last = truncate * (eps_fine[-1] - eps_m)
            # The differentiable extrapolation runs banded single passes
            # in BOTH directions of both the forward and the backward:
            # one step-banded table for the forward softmins, one
            # apply-banded table (smaller bands — its accumulators carry
            # 1+D channels) for the dual gradient contraction.
            tblB_xy_l = plans_banded(mask_xy, ck_l, d_last, nJ_f)
            tblA_xy_l = plans_banded(
                mask_xy, ck_l, d_last, nJ_f, band_tiles=APPLY_BAND_TILES
            )
            if debias:
                tblB_xx_l = plans_banded(mask_xx, ck_l, d_last, nI_f,
                                         tri=True)
                tblA_xx_l = plans_banded(
                    mask_xx, ck_l, d_last, nI_f,
                    band_tiles=APPLY_BAND_TILES, tri=True,
                )
                tblB_yy_l = plans_banded(mask_yy, ck_l, d_last, nJ_f,
                                         tri=True)
                tblA_yy_l = plans_banded(
                    mask_yy, ck_l, d_last, nJ_f,
                    band_tiles=APPLY_BAND_TILES, tri=True,
                )

            def fused_extrap(eps_last, f_ba_f, g_ab_f, f_aa_f, g_bb_f):
                S_xy, S_yx = softmin_extrapolation_walk_banded(
                    x_s, y_s, sg(f_ba_f), sg(g_ab_f),
                    sg(a_log_f), sg(b_log_f), eps_last,
                    tblB_xy_l, tblA_xy_l, p, tile,
                )
                if debias:
                    S_xx = softmin_extrapolation_walk_banded_sym(
                        x_s, sg(f_aa_f), sg(a_log_f), eps_last,
                        tblB_xx_l, tblA_xx_l, p, tile,
                    )
                    S_yy = softmin_extrapolation_walk_banded_sym(
                        y_s, sg(g_bb_f), sg(b_log_f), eps_last,
                        tblB_yy_l, tblA_yy_l, p, tile,
                    )
                else:
                    S_xx = S_yy = None
                return S_xy, S_yx, S_xx, S_yy

        else:
            fused_fine = (
                lambda e, f, g, xs: sinkhorn_step_points(
                    e, x_sd, y_sd, a_log_f, b_log_f, f, g, p=p, impl=impl
                ),
                lambda e, f, xs: sinkhorn_step_points(
                    e, x_sd, x_sd, a_log_f, a_log_f, f, f, p=p, impl=impl,
                    sym=True,
                )[0],
                lambda e, g, xs: sinkhorn_step_points(
                    e, y_sd, y_sd, b_log_f, b_log_f, g, g, p=p, impl=impl,
                    sym=True,
                )[0],
            )

            def run_fine_groups(carry):
                es = list(eps_list[jump + 1:])
                es = [es[0]] * fine_warmup(cluster_scale, p, eps) + es
                return _scan_iterations(
                    (None, None, None, None), carry,
                    es, rho,
                    (a_log_f, b_log_f), debias, dtype,
                    fused=fused_fine,
                )

            def fused_extrap(eps_last, f_ba_f, g_ab_f, f_aa_f, g_bb_f):
                S_xy, S_yx = softmin_extrapolation(
                    x_s, y_s, sg(f_ba_f), sg(g_ab_f),
                    sg(a_log_f), sg(b_log_f), eps_last, p, impl,
                )
                if debias:
                    S_xx = softmin_extrapolation_sym(
                        x_s, sg(f_aa_f), sg(a_log_f), eps_last, p, impl
                    )
                    S_yy = softmin_extrapolation_sym(
                        y_s, sg(g_bb_f), sg(b_log_f), eps_last, p, impl
                    )
                else:
                    S_xx = S_yy = None
                return S_xy, S_yx, S_xx, S_yy

        # --- Fine iterations (detached) -----------------------------------------
        f_ba_f, g_ab_f, f_aa_f, g_bb_f = run_fine_groups(
            (f_ba_f, g_ab_f, f_aa_f, g_bb_f)
        )

        # --- Differentiable last extrapolation ----------------------------------
        eps_last = eps_list[-1]
        damp = dampening(eps_last, rho)
        S_xy, S_yx, S_xx, S_yy = fused_extrap(
            eps_last, f_ba_f, g_ab_f, f_aa_f, g_bb_f
        )
        f_ba_f, g_ab_f = damp * S_xy, damp * S_yx
        if debias:
            f_aa_f, g_bb_f = damp * S_xx, damp * S_yy

    # Zero-mass (padding) slots can carry huge potentials (the -1e5
    # log-weight clamp scaled by eps): harmless in the balanced dot
    # products, but the unbalanced cost's exp(-f/rho) overflows and
    # inf * 0 = NaN. Zero them out — their weight is exactly 0.
    f_ba_f = jnp.where(a_s > 0, f_ba_f, 0.0)
    g_ab_f = jnp.where(b_s > 0, g_ab_f, 0.0)
    if debias:
        f_aa_f = jnp.where(a_s > 0, f_aa_f, 0.0)
        g_bb_f = jnp.where(b_s > 0, g_bb_f, 0.0)

    out = sinkhorn_cost(
        eps,
        rho,
        a_s,
        b_s,
        f_aa_f,
        g_bb_f,
        g_ab_f,
        f_ba_f,
        batch=False,
        debias=debias,
        potentials=potentials,
    )

    if potentials:
        # De-sort back to the user's point order; pad slots map past N and
        # are dropped by the scatter:
        F_x, G_y = out
        f_out = jnp.zeros((N,), F_x.dtype).at[perm_x].set(F_x, mode="drop")
        g_out = jnp.zeros((M,), G_y.dtype).at[perm_y].set(G_y, mode="drop")
        return f_out, g_out
    return out
