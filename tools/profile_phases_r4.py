"""Round-4 phase breakdown of the multiscale backend at 1M-4M points.

Measures every phase of the ACTUAL cascade code path (round 3 added the
intermediate scale; the round-3 profiler predates it) and appends JSONL
rows to PROFILE_PHASES.jsonl so the superlinear 2M-4M diagnosis is
checkable from committed artifacts (round-3 verdict, Weak #1).

Phases (n_delay > 0 configs):
  sort            spatial_sort_blocks, per cloud (x2 in the solve)
  to_mid_state    everything through the mid->fine extrapolation
                  (sort x2 + coarse + mid phase + 4 dense sweeps)
  extrap_dense    the 4 dense mid->fine sweeps alone  <- suspect #1
  masks           build_tile_masks x3 (xy, xx, yy)    <- suspect #2
  fine_step_*     per-eps truncated steps (xy pair, xx, yy), prod caps
  extrap_sparse   fused last extrapolation fwd / fwd+bwd
  full            end-to-end loss+grad (reference point)
Also: per-row kept-tile stats at cap=128 vs MID_CAP (ADVICE round-3
medium finding), and the K=18 vs K=3 dense absorbed-step marginal.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_phases_r4.py N [--skip-full]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import sphere_cloud, warm_up_program_load

OUT = "/root/repo/PROFILE_PHASES.jsonl"
ROWS = []


def emit(**kw):
    # Flush incrementally: the tunneled runtime's warm-up variance can
    # push a full profile past an outer timeout — partial rows must
    # survive.
    ROWS.append(kw)
    print("  " + json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def _sync(out):
    s = 0.0
    for l in jax.tree_util.tree_leaves(out)[:2]:
        s += float(jnp.asarray(l).reshape(-1)[0])
    return s


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    skip_full = "--skip-full" in sys.argv
    warm_up_program_load()
    print(f"== phases at N = {N} ==", flush=True)

    from geomloss_tpu.models import multiscale as ms
    from geomloss_tpu.ops import block_sparse as bs
    from geomloss_tpu.ops.softmin import softmin_points
    from geomloss_tpu.solvers.sinkhorn_loop import log_weights

    p, blur, scaling = 2, 0.05, 0.5
    x = jnp.asarray(sphere_cloud(N, 0))
    y = jnp.asarray(sphere_cloud(N, 1))
    a = jnp.ones((N,), jnp.float32) / N
    b = jnp.ones((N,), jnp.float32) / N

    # --- full loss+grad -------------------------------------------------------
    if not skip_full:
        from geomloss_tpu import SamplesLoss
        loss = SamplesLoss("sinkhorn", p=2, blur=blur, diameter=2.0,
                           scaling=scaling, backend="multiscale")
        step = jax.jit(jax.value_and_grad(lambda x, y: loss(x, y)))
        t0 = time.perf_counter()
        step(x, y)  # compile
        compile_s = time.perf_counter() - t0
        dt = timeit(step, x, y, reps=1)
        emit(N=N, phase="full_loss_grad", ms=round(dt, 1),
             compile_s=round(compile_s, 1))

    # --- sort -----------------------------------------------------------------
    kwargs = dict(p=p, blur=blur, diameter=2.0, scaling=scaling, debias=True)
    tile = ms.auto_tile(N)
    block_size = 1
    while block_size * 2 <= tile and N // (block_size * 2) >= 2000:
        block_size *= 2
    cs = ms.default_cluster_scale(2.0, 3)
    sort_fn = jax.jit(lambda a, x: ms.spatial_sort_blocks(
        a, x, cs, 2.0, block_size, pad_multiple=tile))
    dt = timeit(sort_fn, a, x)
    emit(N=N, phase="sort_one_cloud", ms=round(dt, 1), tile=tile,
         block_size=block_size)

    # --- everything through the mid->fine extrapolation ----------------------
    ms._DEBUG_MID_STATE = True
    mid_fn = jax.jit(lambda a, x, b, y: ms.sinkhorn_multiscale(
        a, x, b, y, **kwargs))
    state = mid_fn(a, x, b, y)
    if not isinstance(state, dict):
        print("config has n_delay == 0; no cascade phases to profile")
        ms._DEBUG_MID_STATE = False
        _dense_step_marginal(N)
        _flush()
        return
    dt = timeit(mid_fn, a, x, b, y, reps=1)
    emit(N=N, phase="to_mid_state", ms=round(dt, 1),
         jump=int(state["jump"]), eps_j=float(state["eps_j"]))
    ms._DEBUG_MID_STATE = False

    x_sd, y_sd = state["x_sd"], state["y_sd"]
    x_md, y_md = state["x_md"], state["y_md"]
    eps_j = float(state["eps_j"])
    eps_list = [float(e) for e in state["eps_list"]]
    jump = int(state["jump"])
    a_s, b_s = state["a_s"], state["b_s"]
    a_log_f, b_log_f = log_weights(a_s), log_weights(b_s)
    print(f"  Npad={x_sd.shape[0]} mid={x_md.shape[0]} tile={tile} "
          f"fine eps={eps_list[jump + 1:]}", flush=True)

    # --- dense mid->fine extrapolation alone ----------------------------------
    h_m = state["b_log_m"] + state["g_ab_m"] / eps_j
    ex1 = jax.jit(lambda h: softmin_points(eps_j, (x_sd, y_md), h, p=p))
    dt1 = timeit(ex1, h_m, reps=1)
    emit(N=N, phase="extrap_dense_one_sweep", ms=round(dt1, 1),
         pairs=x_sd.shape[0] * y_md.shape[0], note="x4 sweeps in the solve")

    # --- mask build -----------------------------------------------------------
    f_f, g_f = state["f_ba_f"], state["g_ab_f"]
    cap_m = ms.mid_cap(x_sd.shape[0], tile)
    mask_fn = jax.jit(lambda: bs.build_tile_masks(
        x_sd, y_sd, f_f, g_f, eps_j, p, 5, tile, cap=cap_m,
        w_x=a_s, w_y=b_s))
    dt = timeit(mask_fn, reps=1)
    emit(N=N, phase="mask_build_xy", ms=round(dt, 1), cap=cap_m,
         note="x3 in the solve (xy, xx, yy)")
    mask_xy = mask_fn()

    # Kept-tile stats at a roomy cap (ADVICE: does MID_CAP clip at 4M?):
    wide = jax.jit(lambda: bs.build_tile_masks(
        x_sd, y_sd, f_f, g_f, eps_j, p, 5, tile, cap=128,
        w_x=a_s, w_y=b_s))()
    emit(N=N, phase="kept_stats_cap128",
         mean=round(float(wide.counts.mean()), 1),
         p99=int(jnp.percentile(wide.counts, 99)),
         max=int(wide.counts.max()),
         clipped_rows_at_cap=int((wide.counts >= cap_m).sum()),
         cap=cap_m)

    # --- fine steps through the PRODUCTION walk kernels -----------------------
    eps_fine = eps_list[jump + 1:]
    cap0 = mask_xy.cols.shape[1]
    nJ_f = y_sd.shape[0] // tile
    f0 = jnp.zeros(x_sd.shape[0], jnp.float32)

    def t_mean_of(ck):
        return max(16, 5 * ck // 8)

    for e in eps_fine:
        ck = min(cap0, max(24, -(-int(np.ceil(cap0 * e / eps_j)) // 8) * 8))
        d = 5 * (e - eps_j)
        cnt = jnp.minimum(bs.retighten_counts(mask_xy.vals, d), ck)
        cntT = jnp.minimum(bs.retighten_counts(mask_xy.valsT, d), ck)
        tb = bs.walk_plan(mask_xy.cols[:, :ck], cnt, t_mean_of(ck))
        tbT = bs.walk_plan(mask_xy.colsT[:, :ck], cntT, t_mean_of(ck))
        tbB = bs.walk_plan_banded(mask_xy.cols[:, :ck], cnt, t_mean_of(ck),
                                  nJ_f)
        fn2 = jax.jit(lambda f, g, tb=tb, tbT=tbT, e=e: bs.sinkhorn_step_walk(
            e, x_sd, y_sd, a_log_f, b_log_f, f, g, tb, tbT, p=p, block=tile))
        dt2 = timeit(fn2, f0, f0, reps=2)
        fn1 = jax.jit(lambda f, g, tbB=tbB, e=e: bs.sinkhorn_step_walk_banded(
            e, x_sd, y_sd, a_log_f, b_log_f, f, g, tbB, p=p, block=tile))
        dt1 = timeit(fn1, f0, f0, reps=2)
        emit(N=N, phase="fine_step_xy_pair", eps=round(e, 5),
             two_pass_ms=round(dt2, 1), banded_ms=round(dt1, 1),
             kept_mean=round(float(cnt.mean()), 1), table_cap=ck)
        fn_s = jax.jit(lambda f, tb=tb, e=e: bs.sinkhorn_step_walk(
            e, x_sd, x_sd, a_log_f, a_log_f, f, f, tb, None, p=p, block=tile,
            sym=True)[0])
        dt = timeit(fn_s, f0, reps=2)
        emit(N=N, phase="fine_step_sym", eps=round(e, 5), ms=round(dt, 1),
             note="x2 in the solve (xx, yy); xy-mask proxy tables")

    # --- fused last extrapolation (banded fwd + dual-apply bwd) ---------------
    e_last = eps_fine[-1]
    ck = min(cap0, max(24, -(-int(np.ceil(cap0 * e_last / eps_j)) // 8) * 8))
    d = 5 * (e_last - eps_j)
    cnt = jnp.minimum(bs.retighten_counts(mask_xy.vals, d), ck)
    tbB = bs.walk_plan_banded(mask_xy.cols[:, :ck], cnt, ck, nJ_f)
    tbA = bs.walk_plan_banded(mask_xy.cols[:, :ck], cnt, ck, nJ_f,
                              band_tiles=bs.APPLY_BAND_TILES,
                              rows_chunk=bs.MAX_APPLY_ROWS)
    ex_fn = jax.jit(lambda f, g: bs.softmin_extrapolation_walk_banded(
        x_sd, y_sd, f, g, a_log_f, b_log_f, e_last, tbB, tbA, p, tile))
    dt = timeit(ex_fn, f0, f0, reps=2)
    emit(N=N, phase="extrap_banded_fwd", ms=round(dt, 1))

    def ex_loss(xx, yy):
        S_xy, S_yx = bs.softmin_extrapolation_walk_banded(
            xx, yy, f0, f0, a_log_f, b_log_f, e_last, tbB, tbA, p, tile)
        return (a_s * S_xy).sum() + (b_s * S_yx).sum()
    ex_grad = jax.jit(jax.grad(ex_loss, argnums=(0, 1)))
    dt = timeit(ex_grad, x_sd, y_sd, reps=2)
    emit(N=N, phase="extrap_banded_fwd_bwd", ms=round(dt, 1))

    _dense_step_marginal(N)
    _flush()


def _dense_step_marginal(N):
    """K=18 (split-exact) vs K=3 (plain bf16) dense absorbed step."""
    from geomloss_tpu.ops.pallas_kernels import sinkhorn_step_pallas
    n = min(N, 100_000)
    x = jnp.asarray(sphere_cloud(n, 7))
    y = jnp.asarray(sphere_cloud(n, 8))
    la = jnp.full((n,), -np.log(n), jnp.float32)
    fz = jnp.zeros((n,), jnp.float32)
    for exact in (True, False):
        fn = jax.jit(lambda f, g, e=exact: sinkhorn_step_pallas(
            x, y, f, g, la, la, 0.05, p=2, exact=e))
        dt = timeit(fn, fz, fz, reps=5)
        emit(N=n, phase="dense_pair_step", exact=exact, ms=round(dt, 1),
             note="K=18 split-exact vs K=3 plain-bf16 (warm lever ceiling)")


def _flush():
    print(f"appended {len(ROWS)} rows to {OUT}")


if __name__ == "__main__":
    main()
