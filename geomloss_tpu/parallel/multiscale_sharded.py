r"""Multi-chip multiscale Sinkhorn: row-sharded truncated fine phase.

The reference's multiscale backend is single-GPU (SURVEY §2.3); this is
its TPU-pod scale-out. Since round 5 the fine phase runs the SAME banded
dual-direction walk kernels as the single-device backend
(``ops/block_sparse.py``), sharded by rows:

1. **One banded traversal per iteration per problem**: each shard walks
   its local row tiles' kept pairs once, producing the row-direction
   softmin locally plus a *partial* column-direction sum over the full
   opposite cloud; a ``psum_scatter`` over the mesh axis turns the
   partials into each shard's slice of the column direction. The
   opposite cloud is replicated (a ``(N, 3)`` f32 cloud is 12 MB at
   N=1e6 — trivially replicable; the ``O(N^2)``-equivalent sweep work is
   what gets divided by the mesh size).
2. **Cross-device traffic per iteration**: one ``all_gather`` of the
   opposite potential shard (softmin bias) plus one ``reduce_scatter``
   of the column partials per problem — a few MB over ICI against tens
   of ms of sweep compute.

Symmetric (debias) problems use the TRIANGLE banded tables
(``walk_plan_banded(..., tri=True, row_offset=shard_row_offset)``): the
union of the shards' local triangles is exactly the global triangle, so
the reduce-scattered mirror contributions reproduce the single-device
pair set — and with the pair SET and kernels shared, the two backends
agree to float noise (``tests/test_multiscale_sharded.py``).

The cheap phases (spatial sort, coarse solve on ~10^3 block centroids,
extrapolation, truncation-mask construction) run replicated — they are
O(N) or O(K^2) with small constants, so there is nothing to win by
sharding them. Gradients use the same envelope shortcut as the
single-device backend: the whole descent is detached, and the last
extrapolation is differentiable through the sharded custom-VJP twins
:func:`_extrap_banded_xy_shard` / :func:`_extrap_banded_sym_shard`,
whose backward runs the dual banded gradient apply per shard and
reduce-scatters the column-direction contraction.

Semantics match ``models/multiscale.py::sinkhorn_multiscale`` (same
schedule, jump rule, truncation scores, per-eps re-thresholded counts,
static cap slicing, and — since round 5 — the same kept-pair planner and
kernels), so multi-chip is pure scale-out.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..models.multiscale import (
    EXTRAP_BM,
    TILE,
    _scan_iterations,
    auto_tile,
    default_cluster_scale,
    fine_cap_schedule,
    fine_warmup,
    jump_index,
    mid_cap,
    mid_delay,
    run_mid_phase,
    spatial_sort_blocks,
)
from ..ops.block_sparse import (
    _SUM_FLOOR,
    APPLY_BAND_TILES,
    MAX_APPLY_ROWS,
    _absorbed_sum_walk_banded,
    build_tile_masks,
    gibbs_apply_walk_banded,
    masks_from_coarse,
    retighten_counts,
    softmin_extrap_truncated,
    walk_plan_banded,
)
from ..ops.softmin import softmin_points
from ..solvers.annealing import dampening, scaling_parameters
from ..solvers.sinkhorn_loop import log_weights, sinkhorn_cost
from .ring import points_mesh

__all__ = ["sinkhorn_multiscale_sharded"]


# ==============================================================================
#  Shard-aware banded walk steps (round 5)
# ==============================================================================
#
# The fine phase shares the single-device backend's banded dual-direction
# kernels (``ops/block_sparse.py``): each shard traverses its LOCAL row
# tiles' kept pairs once, producing the row-direction softmin locally and
# a partial column-direction sum over the FULL opposite cloud; a
# ``psum_scatter`` over the mesh axis turns the partials into each
# shard's slice of the column direction. One traversal per iteration
# replaces the old two-table (cols/colsT) sweep pair, and — because the
# kept-pair SET is now selected by the same planner as the single-device
# backend (``walk_plan_banded``, triangle tables for the symmetric
# debias problems) — the two backends agree to float noise instead of
# diverging where per-row top-``cap`` clipping is asymmetric
# (tests/test_multiscale_sharded.py pins this at rtol 1e-4).


def _step_banded_xy_shard(eps, x_l, y_f, loga_l, logb_l, logb_f, f_l, g_l,
                          g_f, tbl, p, block, axis):
    """One absorbed symmetric-update step of the sharded xy problem:
    local-row softmin ``S_xy`` and this shard's slice of the
    column-direction softmin ``S_yx`` from ONE banded traversal of the
    local kept pairs (+ one reduce-scatter)."""
    eps32 = jnp.asarray(eps, jnp.float32)
    phi = loga_l + f_l / eps32
    psi = logb_f + g_f / eps32
    r, c_part = _absorbed_sum_walk_banded(
        x_l, y_f, phi, psi, eps32, tbl, p, block
    )
    c = jnp.maximum(
        lax.psum_scatter(c_part, axis, scatter_dimension=0, tiled=True),
        _SUM_FLOOR,
    )
    S_xy = (f_l + eps32 * (loga_l - jnp.log(r))).astype(f_l.dtype)
    S_yx = (g_l + eps32 * (logb_l - jnp.log(c))).astype(g_l.dtype)
    return S_xy, S_yx


def _step_banded_sym_shard(eps, x_l, x_f, loga_l, loga_f, f_l, f_f, tbl,
                           p, block, axis):
    """Symmetric absorbed step over this shard's slice of a TRIANGLE
    banded table (``walk_plan_banded(..., tri=True, row_offset=...)``):
    the row direction covers the local kept ``col >= row`` tiles, the
    reduce-scattered column partials supply the mirrored lower-triangle
    contributions from every shard."""
    eps32 = jnp.asarray(eps, jnp.float32)
    phi_l = loga_l + f_l / eps32
    phi_f = loga_f + f_f / eps32
    r, c_part = _absorbed_sum_walk_banded(
        x_l, x_f, phi_l, phi_f, eps32, tbl, p, block
    )
    c = lax.psum_scatter(c_part, axis, scatter_dimension=0, tiled=True)
    s = jnp.maximum(r + c, _SUM_FLOOR)
    return (f_l + eps32 * (loga_l - jnp.log(s))).astype(f_l.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def _extrap_banded_xy_shard(
    x_l, y_l, y_f, f_l, g_l, g_f, loga_l, logb_l, logb_f, eps, tblB, tblA,
    p, block, axis,
):
    """Sharded twin of ``softmin_extrapolation_walk_banded``: the forward
    is :func:`_step_banded_xy_shard`; the backward runs the dual banded
    gradient apply on the local rows and reduce-scatters the
    column-direction contraction, so both envelope gradients (to the
    local ``x_l`` and ``y_l`` slices) come from one traversal per shard.

    ``y_f``/``g_f``/``logb_f`` are the detached all-gathered full-cloud
    operands; ``y_l`` is the differentiable local slice (the
    column-direction gradient is returned on it directly — no gather
    transpose). ``tblA`` must be planned at ``band_tiles =
    APPLY_BAND_TILES, rows_chunk = MAX_APPLY_ROWS``."""
    return _step_banded_xy_shard(
        eps, x_l, y_f, loga_l, logb_l, logb_f, f_l, g_l, g_f, tblB, p,
        block, axis,
    )


def _extrap_banded_xy_shard_fwd(
    x_l, y_l, y_f, f_l, g_l, g_f, loga_l, logb_l, logb_f, eps, tblB, tblA,
    p, block, axis,
):
    S_xy, S_yx = _step_banded_xy_shard(
        eps, x_l, y_f, loga_l, logb_l, logb_f, f_l, g_l, g_f, tblB, p,
        block, axis,
    )
    return (S_xy, S_yx), (
        x_l, y_l, y_f, f_l, g_l, g_f, loga_l, logb_l, logb_f, eps, tblA,
        S_xy, S_yx,
    )


def _extrap_banded_xy_shard_bwd(p, block, axis, res, us):
    (x_l, y_l, y_f, f_l, g_l, g_f, loga_l, logb_l, logb_f, eps, tblA,
     S_xy, S_yx) = res
    u_f, u_g = us
    eps32 = jnp.asarray(eps, jnp.float32)
    f32 = jnp.float32
    x32, y32 = x_l.astype(f32), y_l.astype(f32)
    phi = loga_l + f_l / eps32
    psi = logb_f + g_f / eps32
    if p == 2:
        Vy, Vx, kind = y_f.astype(f32), x32, "gibbs"
    else:
        Vy = jnp.concatenate(
            [jnp.ones((y_f.shape[0], 1), f32), y_f.astype(f32)], axis=-1
        )
        Vx = jnp.concatenate(
            [jnp.ones((x_l.shape[0], 1), f32), x32], axis=-1
        )
        kind = "gibbs_grad"
    Rr, Rc_part = gibbs_apply_walk_banded(
        x_l, y_f, phi, psi, Vy, Vx, eps32, tblA, p=p, kind=kind,
        block=block,
    )
    Rc = lax.psum_scatter(Rc_part, axis, scatter_dimension=0, tiled=True)
    r = jnp.maximum(jnp.exp(loga_l + (f_l - S_xy) / eps32), _SUM_FLOOR)
    c = jnp.maximum(jnp.exp(logb_l + (g_l - S_yx) / eps32), _SUM_FLOOR)
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
        dx.astype(x_l.dtype), dy.astype(y_l.dtype), z(y_f),
        z(f_l), z(g_l), z(g_f), z(loga_l), z(logb_l), z(logb_f),
        jnp.zeros_like(jnp.asarray(eps)), None, None,
    )


_extrap_banded_xy_shard.defvjp(
    _extrap_banded_xy_shard_fwd, _extrap_banded_xy_shard_bwd
)


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _extrap_banded_sym_shard(
    x_l, x_f, f_l, f_f, loga_l, loga_f, eps, tblB, tblA, p, block, axis
):
    """Sharded twin of ``softmin_extrapolation_walk_banded_sym``
    (triangle tables, mirrored column partials reduce-scattered across
    shards in both the forward and the backward)."""
    return _step_banded_sym_shard(
        eps, x_l, x_f, loga_l, loga_f, f_l, f_f, tblB, p, block, axis
    )


def _extrap_banded_sym_shard_fwd(
    x_l, x_f, f_l, f_f, loga_l, loga_f, eps, tblB, tblA, p, block, axis
):
    S = _step_banded_sym_shard(
        eps, x_l, x_f, loga_l, loga_f, f_l, f_f, tblB, p, block, axis
    )
    return S, (x_l, x_f, f_l, f_f, loga_l, loga_f, eps, tblA, S)


def _extrap_banded_sym_shard_bwd(p, block, axis, res, u):
    x_l, x_f, f_l, f_f, loga_l, loga_f, eps, tblA, S = res
    eps32 = jnp.asarray(eps, jnp.float32)
    f32 = jnp.float32
    x32 = x_l.astype(f32)
    phi_l = loga_l + f_l / eps32
    phi_f = loga_f + f_f / eps32
    if p == 2:
        V_l, V_f, kind = x32, x_f.astype(f32), "gibbs"
    else:
        V_l = jnp.concatenate(
            [jnp.ones((x_l.shape[0], 1), f32), x32], axis=-1
        )
        V_f = jnp.concatenate(
            [jnp.ones((x_f.shape[0], 1), f32), x_f.astype(f32)], axis=-1
        )
        kind = "gibbs_grad"
    Rr, Rc_part = gibbs_apply_walk_banded(
        x_l, x_f, phi_l, phi_f, V_f, V_l, eps32, tblA, p=p, kind=kind,
        block=block,
    )
    Rc = lax.psum_scatter(Rc_part, axis, scatter_dimension=0, tiled=True)
    R = Rr + Rc  # local upper-triangle rows + mirrored columns (all shards)
    s = jnp.maximum(jnp.exp(loga_l + (f_l - S) / eps32), _SUM_FLOOR)
    if p == 2:
        dx = u[:, None] * (x32 - R / s[:, None])
    else:
        dx = u[:, None] * (x32 * (R[:, :1] / s[:, None])
                           - R[:, 1:] / s[:, None])
    z = jnp.zeros_like
    return (
        dx.astype(x_l.dtype), z(x_f), z(f_l), z(f_f), z(loga_l),
        z(loga_f), jnp.zeros_like(jnp.asarray(eps)), None, None,
    )


_extrap_banded_sym_shard.defvjp(
    _extrap_banded_sym_shard_fwd, _extrap_banded_sym_shard_bwd
)


def sinkhorn_multiscale_sharded(
    a,
    x,
    b,
    y,
    mesh=None,
    axis="points",
    p=2,
    blur=0.05,
    reach=None,
    diameter=None,
    scaling=0.5,
    truncate=5,
    cluster_scale=None,
    debias=True,
    potentials=False,
    labels_x=None,
    labels_y=None,
    tile="auto",
    block_size="auto",
    target_clusters=2000,
    cap=None,
    impl="auto",
    verbose=False,
):
    """Debiased multiscale Sinkhorn divergence with the truncated fine
    phase sharded across a 1D device mesh.

    Same arguments and semantics as
    :func:`geomloss_tpu.models.multiscale.sinkhorn_multiscale`, plus
    ``mesh`` / ``axis`` like :func:`geomloss_tpu.parallel.sinkhorn_ring`.
    Any N, M: clouds are padded internally. Differentiable in ``x`` and
    ``y`` (envelope gradient).

    Returns the scalar divergence (replicated), or with
    ``potentials=True`` the global ``(N,)`` / ``(M,)`` potential pair.
    """
    if mesh is None:
        mesh = points_mesh(axis=axis)
    R = mesh.devices.size

    if truncate is None:
        raise NotImplementedError(
            "The sharded fine phase is built on the truncated tile tables; "
            "truncate=None (exact fine sweeps) is only available on the "
            "single-device multiscale backend or via sinkhorn_ring."
        )

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
        block_size = 1
        while (
            block_size * 2 <= tile
            and max(N, M) // (block_size * 2) >= target_clusters
        ):
            block_size *= 2

    # Pad so the tile-row axis divides the mesh: spatial_sort_blocks pads
    # to tile * 2^k slots, so requiring R * tile slots makes nI % R == 0
    # for any power-of-two mesh size.
    pad_multiple = tile * R

    # --- Replicated prologue ------------------------------------------------
    # N.B.: the sort / coarse-solve / mid-phase / extrapolation / mask
    # sequence below mirrors models/multiscale.py::sinkhorn_multiscale —
    # keep the two in sync when touching either. The parity tests in
    # tests/test_multiscale_sharded.py pin their agreement.
    (aw_c, a_s), (x_c, x_s), perm_x = spatial_sort_blocks(
        a, x, cluster_scale, diameter, block_size, pad_multiple=pad_multiple,
        labels=labels_x,
    )
    (bw_c, b_s), (y_c, y_s), perm_y = spatial_sort_blocks(
        b, y, cluster_scale, diameter, block_size, pad_multiple=pad_multiple,
        labels=labels_y,
    )

    jump = jump_index(eps_list, cluster_scale, p)

    sg = lax.stop_gradient
    dtype = x_s.dtype
    a_log_c, b_log_c = log_weights(aw_c), log_weights(bw_c)
    a_log_f, b_log_f = log_weights(a_s), log_weights(b_s)

    sm = partial(softmin_points, p=p, impl=impl)
    x_cd, y_cd = sg(x_c), sg(y_c)
    x_sd, y_sd = sg(x_s), sg(y_s)

    # Coarse phase on the block centroids (detached, replicated):
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
    f_ba, g_ab, f_aa, g_bb = _scan_iterations(
        coarse_fns,
        (f_ba, g_ab, f_aa, g_bb),
        eps_list[: jump + 1],
        rho,
        (a_log_c, b_log_c),
        debias,
        dtype,
    )

    eps_j = eps_list[jump]
    damp_j = dampening(eps_j, rho)
    last_is_jump = jump == len(eps_list) - 1

    # --- Optional intermediate scale (replicated; see models.multiscale) ----
    n_delay = 0
    if not last_is_jump:
        n_delay = mid_delay(max(N, M), eps_list, jump, scaling, p)
    if n_delay > 0:
        (f_ba, g_ab, f_aa, g_bb), x_md, y_md, a_log_m, b_log_m = run_mid_phase(
            sm,
            (f_ba, g_ab, f_aa, g_bb),
            x_cd, y_cd, a_log_c, b_log_c,
            a_s, b_s, x_sd, y_sd,
            eps_list, jump, n_delay, rho, debias, dtype, block_size, scaling,
            verbose=verbose,
        )
        jump = jump + n_delay
        eps_j = eps_list[jump]
        damp_j = dampening(eps_j, rho)
        last_is_jump = jump == len(eps_list) - 1
        x_cd, y_cd = x_md, y_md
        a_log_c, b_log_c = a_log_m, b_log_m

    # Extrapolation onto the fine clouds (replicated). On a
    # last-iteration jump this is the differentiable tail, so gradients
    # flow through the fine points (models/multiscale.py ``x_e``/``y_e``):
    x_e = x_s if last_is_jump else x_sd
    y_e = y_s if last_is_jump else y_sd

    def _extrap(rows, src, h):
        # Truncated detached sweeps (round 4) — mirrors
        # models/multiscale.py::sinkhorn_multiscale.
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

    if last_is_jump:
        # The schedule ends at the jump: there is no fine phase to shard.
        # The extrapolation above is the whole (replicated) tail — same
        # semantics as the single-device backend's last-iteration jump.
        f_ba_f = jnp.where(a_s > 0, f_ba_f, 0.0)
        g_ab_f = jnp.where(b_s > 0, g_ab_f, 0.0)
        if debias:
            f_aa_f = jnp.where(a_s > 0, f_aa_f, 0.0)
            g_bb_f = jnp.where(b_s > 0, g_bb_f, 0.0)
        out = sinkhorn_cost(
            eps, rho, a_s, b_s, f_aa_f, g_bb_f, g_ab_f, f_ba_f,
            batch=False, debias=debias, potentials=potentials,
        )
        if potentials:
            F_s, G_s = out
            f_out = jnp.zeros((N,), F_s.dtype).at[perm_x].set(F_s, mode="drop")
            g_out = jnp.zeros((M,), G_s.dtype).at[perm_y].set(G_s, mode="drop")
            return f_out, g_out
        return out

    # Truncation masks (replicated; the per-row tables are then
    # row-sharded). With an intermediate scale, the potentials already
    # live on the fine cloud — use the tile-geometry keep rule; otherwise
    # the pointwise coarse rule (reference ``kernel_truncation``):
    if n_delay > 0:
        # Tables built at the first fine temperature with an nJ-scaled
        # width (see models/multiscale.py::mid_cap — round 3's fixed
        # cap 64 silently clipped ~43% of rows at 2M):
        eps_b = eps_list[jump + 1]
        cap_m = cap if cap is not None else mid_cap(x_sd.shape[0], tile)
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
        else:
            mask_xx = mask_yy = jax.tree.map(lambda v: v[:0], mask_xy)
    else:
        bpt = tile // block_size
        mask_xy = masks_from_coarse(
            x_cd, y_cd, f_ba, g_ab, aw_c, bw_c, eps_j, p, truncate, bpt,
            cap=cap,
        )
        if debias:
            mask_xx = masks_from_coarse(
                x_cd, x_cd, f_aa, f_aa, aw_c, aw_c, eps_j, p, truncate, bpt,
                cap=cap, sym=True,
            )
            mask_yy = masks_from_coarse(
                y_cd, y_cd, g_bb, g_bb, bw_c, bw_c, eps_j, p, truncate, bpt,
                cap=cap, sym=True,
            )
        else:
            mask_xx = mask_yy = jax.tree.map(lambda v: v[:0], mask_xy)

    eps_fine = [float(e) for e in eps_list[jump + 1 :]]
    # Wash out the coarse warm-start bias at tiny blurs (see
    # models/multiscale.py::fine_warmup):
    eps_fine = [eps_fine[0]] * fine_warmup(cluster_scale, p, eps) + eps_fine
    eps_last = eps_list[-1]
    damp_last = dampening(eps_last, rho)
    # Temperature the tables were built at (the retighten deltas are
    # relative to it): first fine eps on the mid path, jump eps classic.
    eps_m = eps_list[jump + 1] if n_delay > 0 else eps_j
    d_last = truncate * (eps_last - eps_m)

    # Static per-eps cap slicing (same schedule as the single-device fine
    # phase): masked grid steps still cost ~1 us each, so the tables must
    # shrink with the keep radius as the temperature drops.
    groups = fine_cap_schedule(eps_fine, eps_m, mask_xy.cols.shape[1])
    cap_last = groups[-1][0]

    def stacks(es):
        return (
            jnp.asarray(es, dtype),
            jnp.asarray([dampening(e, rho) for e in es], dtype),
            jnp.asarray([truncate * (e - eps_m) for e in es], dtype),
        )

    # --- Sharded fine phase -------------------------------------------------
    def fine(
        x_l, y_l, x_f, y_f, al_l, bl_l, al_f, bl_f,
        f_l, g_l, faa_l, gbb_l,
        cols_l, vals_l,
        cxx_l, vxx_l, cyy_l, vyy_l,
        a_l, b_l,
    ):
        x_fd, y_fd = sg(x_f), sg(y_f)
        x_ld, y_ld = sg(x_l), sg(y_l)

        def gather(v):
            return lax.all_gather(v, axis, tiled=True)

        # Global column-tile counts and this shard's global row-tile
        # offsets (the triangle plans compare global indices):
        nI_t = x_f.shape[0] // tile
        nJ_t = y_f.shape[0] // tile
        idx = lax.axis_index(axis)
        off_x = idx * (x_l.shape[0] // tile)
        off_y = idx * (y_l.shape[0] // tile)

        def plans(cols, vals, ck, d, n_col, tri=False, off=0,
                  apply_plan=False):
            # Same kept-set rule as the single-device backend
            # (models/multiscale.py::plans_banded): full-cap step budget
            # (no data-dependent clip), per-eps retightened counts.
            cnt = jnp.minimum(retighten_counts(vals, d), ck)
            kw = {}
            if apply_plan:
                kw = {"band_tiles": APPLY_BAND_TILES,
                      "rows_chunk": MAX_APPLY_ROWS}
            return walk_plan_banded(
                cols[:, :ck], cnt, ck, n_col, tri=tri, row_offset=off,
                **kw,
            )

        carry = (f_l, g_l, faa_l, gbb_l)
        for ck, es in groups:
            ds = [truncate * (e - eps_m) for e in es]
            xs = {
                "e": stacks(es),
                "xy": jnp.stack(
                    [plans(cols_l, vals_l, ck, d, nJ_t) for d in ds]
                ),
            }
            if debias:
                xs["xx"] = jnp.stack(
                    [plans(cxx_l, vxx_l, ck, d, nI_t, tri=True, off=off_x)
                     for d in ds]
                )
                xs["yy"] = jnp.stack(
                    [plans(cyy_l, vyy_l, ck, d, nJ_t, tri=True, off=off_y)
                     for d in ds]
                )

            def body(carry, inp):
                e, damp, _ = inp["e"]
                f_l, g_l, faa_l, gbb_l = carry
                f_f, g_f = gather(f_l), gather(g_l)
                S_xy, S_yx = _step_banded_xy_shard(
                    e, x_ld, y_fd, al_l, bl_l, bl_f, f_l, g_l, g_f,
                    inp["xy"], p, tile, axis,
                )
                f_n = 0.5 * (f_l + damp * S_xy)
                g_n = 0.5 * (g_l + damp * S_yx)
                if debias:
                    faa_f, gbb_f = gather(faa_l), gather(gbb_l)
                    S_xx = _step_banded_sym_shard(
                        e, x_ld, x_fd, al_l, al_f, faa_l, faa_f,
                        inp["xx"], p, tile, axis,
                    )
                    S_yy = _step_banded_sym_shard(
                        e, y_ld, y_fd, bl_l, bl_f, gbb_l, gbb_f,
                        inp["yy"], p, tile, axis,
                    )
                    faa_n = 0.5 * (faa_l + damp * S_xx)
                    gbb_n = 0.5 * (gbb_l + damp * S_yy)
                else:
                    faa_n, gbb_n = faa_l, gbb_l
                return (f_n, g_n, faa_n, gbb_n), None

            carry, _ = lax.scan(body, carry, xs)
        f_l, g_l, faa_l, gbb_l = carry

        # --- Differentiable last extrapolation (envelope gradient) --------
        # Banded single passes in BOTH directions of both the forward and
        # the backward, like the single-device backend: one step-banded
        # table, one apply-banded table (smaller bands) per problem.
        ck = cap_last
        f_l, g_l = sg(f_l), sg(g_l)
        g_f = gather(g_l)
        tblB_xy = plans(cols_l, vals_l, ck, d_last, nJ_t)
        tblA_xy = plans(cols_l, vals_l, ck, d_last, nJ_t, apply_plan=True)
        S_xy, S_yx = _extrap_banded_xy_shard(
            x_l, y_l, y_fd, f_l, g_l, g_f, al_l, bl_l, bl_f, eps_last,
            tblB_xy, tblA_xy, p, tile, axis,
        )
        f_ba = damp_last * S_xy
        g_ab = damp_last * S_yx
        if debias:
            faa_l, gbb_l = sg(faa_l), sg(gbb_l)
            faa_f, gbb_f = gather(faa_l), gather(gbb_l)
            tblB_xx = plans(cxx_l, vxx_l, ck, d_last, nI_t, tri=True,
                            off=off_x)
            tblA_xx = plans(cxx_l, vxx_l, ck, d_last, nI_t, tri=True,
                            off=off_x, apply_plan=True)
            tblB_yy = plans(cyy_l, vyy_l, ck, d_last, nJ_t, tri=True,
                            off=off_y)
            tblA_yy = plans(cyy_l, vyy_l, ck, d_last, nJ_t, tri=True,
                            off=off_y, apply_plan=True)
            S_xx = _extrap_banded_sym_shard(
                x_l, x_fd, faa_l, faa_f, al_l, al_f, eps_last,
                tblB_xx, tblA_xx, p, tile, axis,
            )
            S_yy = _extrap_banded_sym_shard(
                y_l, y_fd, gbb_l, gbb_f, bl_l, bl_f, eps_last,
                tblB_yy, tblA_yy, p, tile, axis,
            )
            f_aa = damp_last * S_xx
            g_bb = damp_last * S_yy
        else:
            f_aa = g_bb = None

        # Zero-mass (padding) slots carry huge clamped potentials which
        # overflow the unbalanced cost's exp(-f/rho) (0 * inf = NaN):
        f_ba = jnp.where(a_l > 0, f_ba, 0.0)
        g_ab = jnp.where(b_l > 0, g_ab, 0.0)
        if debias:
            f_aa = jnp.where(a_l > 0, f_aa, 0.0)
            g_bb = jnp.where(b_l > 0, g_bb, 0.0)

        if potentials:
            return sinkhorn_cost(
                eps, rho, a_l, b_l, f_aa, g_bb, g_ab, f_ba,
                batch=False, debias=debias, potentials=True,
            )
        local = sinkhorn_cost(
            eps, rho, a_l, b_l, f_aa, g_bb, g_ab, f_ba,
            batch=False, debias=debias, potentials=False,
        )
        return lax.psum(local, axis)

    sh1 = P(axis)
    sh2 = P(axis, None)
    rep1, rep2 = P(None), P(None, None)
    in_specs = (
        sh2, sh2, rep2, rep2,  # x_l, y_l, x_f, y_f
        sh1, sh1, rep1, rep1,  # a_log shards + full
        sh1, sh1, sh1, sh1,    # f, g, f_aa, g_bb
        sh2, sh2,              # xy table (cols, vals)
        sh2, sh2, sh2, sh2,    # xx / yy tables (cols, vals) x2
        sh1, sh1,              # a_s, b_s shards
    )
    out_specs = (sh1, sh1) if potentials else P()

    # check_vma=False is forced by a JAX limitation, not a shortcut: the
    # sparse-sweep pallas_calls inside would need vma={axis} annotations
    # on their out_shapes, but pallas interpret mode (the off-TPU path
    # used by the CPU-mesh tests and the driver dryrun) evaluates kernel
    # bodies as jaxprs where literals carry empty vma, failing with
    # "Primitive mul requires varying manual axes to match ... as a
    # temporary workaround pass check_vma=False". Every output here is
    # shard-local by construction (row-sharded tables in, row-sharded
    # potentials out); the parity tests below pin the semantics.
    # jit the whole sharded fine phase: since round 5 the body builds the
    # banded step tables inside (dozens of small ops per temperature) —
    # eager shard_map would dispatch each as its own SPMD program, with
    # multi-device launch overhead per op. Under an outer jit this inner
    # jit inlines; eager callers get one compile per shape.
    fn = jax.jit(jax.shard_map(
        fine, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    ))
    out = fn(
        x_s, y_s, x_s, y_s,
        a_log_f, b_log_f, a_log_f, b_log_f,
        f_ba_f, g_ab_f, f_aa_f, g_bb_f,
        mask_xy.cols, mask_xy.vals,
        mask_xx.cols, mask_xx.vals, mask_yy.cols, mask_yy.vals,
        a_s, b_s,
    )

    if potentials:
        F_s, G_s = out
        f_out = jnp.zeros((N,), F_s.dtype).at[perm_x].set(F_s, mode="drop")
        g_out = jnp.zeros((M,), G_s.dtype).at[perm_y].set(G_s, mode="drop")
        return f_out, g_out
    return out
