r"""Multi-chip multiscale Sinkhorn: row-sharded truncated fine phase.

The reference's multiscale backend is single-GPU (SURVEY §2.3); this is
its TPU-pod scale-out. The structure exploits two facts about the fused
absorbed step (``ops/block_sparse.py``):

1. **Both softmin directions are row reductions** over their own tile
   tables (``cols`` for x-rows, ``colsT`` for y-rows) — so sharding the
   *rows* of both clouds across a 1D mesh makes every sparse sweep
   device-local, provided each device also holds a replicated copy of
   the opposite cloud (a ``(N, 3)`` f32 cloud is 12 MB at N=1e6 —
   trivially replicable; the ``O(N^2)``-equivalent sweep work is what
   gets divided by the mesh size).
2. **The only cross-device dependency per iteration is the opposite
   potential vector** (the softmin bias): one ``all_gather`` of a
   ``(N/R,)`` f32 shard per direction per iteration — a few MB over ICI
   against tens of ms of sweep compute.

The cheap phases (spatial sort, coarse solve on ~10^3 block centroids,
extrapolation, truncation-mask construction) run replicated — they are
O(N) or O(K^2) with small constants, so there is nothing to win by
sharding them. Gradients use the same envelope shortcut as the
single-device backend: the whole descent is detached, and the last
extrapolation is differentiable through
:func:`~geomloss_tpu.ops.block_sparse.softmin_extrapolation_sparse_dir`
— whose detached-cost convention (gradient to the row cloud only) means
no cross-device cotangents exist at all.

Semantics match ``models/multiscale.py::sinkhorn_multiscale`` (same
schedule, jump rule, truncation scores, per-eps re-thresholded counts
and static cap slicing), and so does single-chip performance: 1.17 s
loss+grad at N=1e6 on a mesh of one — multi-chip is pure scale-out.
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
    _absorbed_sum,
    build_tile_masks,
    masks_from_coarse,
    retighten_counts,
    softmin_extrap_truncated,
    softmin_extrapolation_sparse_dir,
)
from ..ops.softmin import softmin_points
from ..solvers.annealing import dampening, scaling_parameters
from ..solvers.sinkhorn_loop import log_weights, sinkhorn_cost
from .ring import points_mesh

__all__ = ["sinkhorn_multiscale_sharded"]


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
        cols_l, counts_l, vals_l, colsT_l, countsT_l, valsT_l,
        cxx_l, vxx_l, cyy_l, vyy_l,
        a_l, b_l,
    ):
        x_fd, y_fd = sg(x_f), sg(y_f)
        x_ld, y_ld = sg(x_l), sg(y_l)

        def gather(v):
            return lax.all_gather(v, axis, tiled=True)

        carry = (f_l, g_l, faa_l, gbb_l)
        for ck, es in groups:
            cols_k, vals_k = cols_l[:, :ck], vals_l[:, :ck]
            colsT_k, valsT_k = colsT_l[:, :ck], valsT_l[:, :ck]
            cxx_k, vxx_k = cxx_l[:, :ck], vxx_l[:, :ck]
            cyy_k, vyy_k = cyy_l[:, :ck], vyy_l[:, :ck]

            def body(carry, inp, cols_k=cols_k, vals_k=vals_k,
                     colsT_k=colsT_k, valsT_k=valsT_k, cxx_k=cxx_k,
                     vxx_k=vxx_k, cyy_k=cyy_k, vyy_k=vyy_k):
                e, damp, delta = inp
                f_l, g_l, faa_l, gbb_l = carry
                f_f, g_f = gather(f_l), gather(g_l)
                cnt = jnp.minimum(retighten_counts(vals_k, delta), counts_l)
                r = _absorbed_sum(
                    x_ld, y_fd, al_l + f_l / e, bl_f + g_f / e, e,
                    cols_k, cnt, p, tile,
                )
                S_xy = f_l + e * (al_l - jnp.log(r))
                cntT = jnp.minimum(
                    retighten_counts(valsT_k, delta), countsT_l
                )
                c = _absorbed_sum(
                    y_ld, x_fd, bl_l + g_l / e, al_f + f_f / e, e,
                    colsT_k, cntT, p, tile,
                )
                S_yx = g_l + e * (bl_l - jnp.log(c))
                f_n = 0.5 * (f_l + damp * S_xy)
                g_n = 0.5 * (g_l + damp * S_yx)
                if debias:
                    faa_f, gbb_f = gather(faa_l), gather(gbb_l)
                    cxx_cnt = retighten_counts(vxx_k, delta)
                    rxx = _absorbed_sum(
                        x_ld, x_fd, al_l + faa_l / e, al_f + faa_f / e, e,
                        cxx_k, cxx_cnt, p, tile,
                    )
                    S_xx = faa_l + e * (al_l - jnp.log(rxx))
                    cyy_cnt = retighten_counts(vyy_k, delta)
                    ryy = _absorbed_sum(
                        y_ld, y_fd, bl_l + gbb_l / e, bl_f + gbb_f / e, e,
                        cyy_k, cyy_cnt, p, tile,
                    )
                    S_yy = gbb_l + e * (bl_l - jnp.log(ryy))
                    faa_n = 0.5 * (faa_l + damp * S_xx)
                    gbb_n = 0.5 * (gbb_l + damp * S_yy)
                else:
                    faa_n, gbb_n = faa_l, gbb_l
                return (f_n, g_n, faa_n, gbb_n), None

            carry, _ = lax.scan(body, carry, stacks(es))
        f_l, g_l, faa_l, gbb_l = carry

        # --- Differentiable last extrapolation (envelope gradient) --------
        ck = cap_last
        f_l, g_l = sg(f_l), sg(g_l)
        f_f, g_f = gather(f_l), gather(g_l)
        cnt = jnp.minimum(retighten_counts(vals_l[:, :ck], d_last), counts_l)
        cntT = jnp.minimum(
            retighten_counts(valsT_l[:, :ck], d_last), countsT_l
        )
        S_xy = softmin_extrapolation_sparse_dir(
            x_l, y_fd, f_l, g_f, al_l, bl_f, eps_last, cols_l[:, :ck],
            cnt, p, tile,
        )
        S_yx = softmin_extrapolation_sparse_dir(
            y_l, x_fd, g_l, f_f, bl_l, al_f, eps_last, colsT_l[:, :ck],
            cntT, p, tile,
        )
        f_ba = damp_last * S_xy
        g_ab = damp_last * S_yx
        if debias:
            faa_l, gbb_l = sg(faa_l), sg(gbb_l)
            faa_f, gbb_f = gather(faa_l), gather(gbb_l)
            cxx_cnt = retighten_counts(vxx_l[:, :ck], d_last)
            cyy_cnt = retighten_counts(vyy_l[:, :ck], d_last)
            S_xx = softmin_extrapolation_sparse_dir(
                x_l, x_fd, faa_l, faa_f, al_l, al_f, eps_last,
                cxx_l[:, :ck], cxx_cnt, p, tile,
            )
            S_yy = softmin_extrapolation_sparse_dir(
                y_l, y_fd, gbb_l, gbb_f, bl_l, bl_f, eps_last,
                cyy_l[:, :ck], cyy_cnt, p, tile,
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
        sh2, sh1, sh2, sh2, sh1, sh2,  # xy tables (cols, counts, vals) x2
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
    fn = jax.shard_map(
        fine, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    out = fn(
        x_s, y_s, x_s, y_s,
        a_log_f, b_log_f, a_log_f, b_log_f,
        f_ba_f, g_ab_f, f_aa_f, g_bb_f,
        mask_xy.cols, mask_xy.counts, mask_xy.vals,
        mask_xy.colsT, mask_xy.countsT, mask_xy.valsT,
        mask_xx.cols, mask_xx.vals, mask_yy.cols, mask_yy.vals,
        a_s, b_s,
    )

    if potentials:
        F_s, G_s = out
        f_out = jnp.zeros((N,), F_s.dtype).at[perm_x].set(F_s, mode="drop")
        g_out = jnp.zeros((M,), G_s.dtype).at[perm_y].set(G_s, mode="drop")
        return f_out, g_out
    return out
