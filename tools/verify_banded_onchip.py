"""On-chip banded-walk validation at production scale (round-5 item 1b).

Round 4 shipped the banded dual-direction walk unvalidated end-to-end and
the committed 1M full-solve loss moved 3.84e-06 -> 2.85e-05. The banded
kernels are exact in interpreter mode at small scale (VERDICT round 4);
this script tests the two large-N/on-chip hypotheses directly on the
bench chip:

  1. budget clip  — plans here use the round-5 full-cap budget (never
     clips); if values match the two-pass walk, the round-4 proportional
     clip (t_mean = 5*cap/8) was the defect.
  2. on-chip Mosaic RMW accumulation — if the banded outputs differ from
     the two-pass walk ON THE SAME TABLES at 1M on chip, the kernel
     itself is broken on hardware.

It rebuilds the exact 1M fine-phase state (sphere seeds 0/1, bench
config) via the `_DEBUG_MID_STATE` hook, then diffs, at the entry fine
temperature:

  * sinkhorn_step_walk_banded  vs sinkhorn_step_walk (same kept set)
  * sinkhorn_step_walk_banded_sym (tri tables) vs the full sym walk

Usage:
  python tools/verify_banded_onchip.py [N]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import sphere_cloud, warm_up_program_load


def rel_err(va, vb, live):
    """Max relative error over live (positive-mass) rows only: padding
    rows carry +-inf potentials in BOTH kernels (zero mass, parked
    coordinates) and would turn the diff into inf - inf = NaN."""
    va = np.asarray(va, np.float64)[np.asarray(live)]
    vb = np.asarray(vb, np.float64)[np.asarray(live)]
    scale = np.abs(vb).max() + 1e-30
    return float(np.abs(va - vb).max() / scale)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    warm_up_program_load()

    import geomloss_tpu.models.multiscale as ms
    import geomloss_tpu.ops.block_sparse as bs
    from geomloss_tpu.ops.block_sparse import build_tile_masks

    x = jnp.asarray(sphere_cloud(N, 0))
    y = jnp.asarray(sphere_cloud(N, 1))
    a = jnp.full((N,), 1.0 / N, jnp.float32)
    b = jnp.full((N,), 1.0 / N, jnp.float32)

    ms._DEBUG_MID_STATE = True
    try:
        st = ms.sinkhorn_multiscale(
            a, x, b, y, p=2, blur=0.05, diameter=2.0, scaling=0.5,
        )
    finally:
        ms._DEBUG_MID_STATE = False

    tile = st["tile"]
    p = 2
    truncate = 5
    eps_list = st["eps_list"]
    jump = st["jump"]
    eps_b = eps_list[jump + 1]
    x_sd, y_sd = st["x_sd"], st["y_sd"]
    a_s, b_s = st["a_s"], st["b_s"]
    f_ba_f, g_ab_f = st["f_ba_f"], st["g_ab_f"]
    f_aa_f = st["f_aa_f"]
    a_log_f = jnp.log(jnp.maximum(a_s, 1e-40)).astype(jnp.float32)
    b_log_f = jnp.log(jnp.maximum(b_s, 1e-40)).astype(jnp.float32)

    cap_m = ms.mid_cap(x_sd.shape[0], tile)
    mask_xy = build_tile_masks(
        x_sd, y_sd, f_ba_f, g_ab_f, eps_b, p, truncate, tile,
        cap=cap_m, w_x=a_s, w_y=b_s,
    )
    mask_xx = build_tile_masks(
        x_sd, x_sd, f_aa_f, f_aa_f, eps_b, p, truncate, tile,
        cap=cap_m, w_x=a_s, w_y=a_s, sym=True,
    )

    nI_f = x_sd.shape[0] // tile
    nJ_f = y_sd.shape[0] // tile
    ck = mask_xy.cols.shape[1]
    cnt = jnp.minimum(mask_xy.counts, ck)
    cntT = jnp.minimum(mask_xy.countsT, mask_xy.colsT.shape[1])
    kept = np.asarray(cnt)
    print(json.dumps(dict(
        N=N, tile=tile, cap=ck, kept_mean=round(float(kept.mean()), 1),
        kept_p99=int(np.percentile(kept, 99)), kept_max=int(kept.max()),
    )), flush=True)

    # --- asymmetric pair step: banded vs two-pass on the SAME kept set --
    e = float(eps_b)
    tbl = bs.walk_plan(mask_xy.cols, cnt, ck)
    tblT = bs.walk_plan(mask_xy.colsT, cntT, int(mask_xy.colsT.shape[1]))
    tblB = bs.walk_plan_banded(mask_xy.cols, cnt, ck, nJ_f)

    f0 = f_ba_f.astype(jnp.float32)
    g0 = g_ab_f.astype(jnp.float32)

    two = jax.jit(lambda f, g: bs.sinkhorn_step_walk(
        e, x_sd, y_sd, a_log_f, b_log_f, f, g, tbl, tblT, p=p, block=tile))
    ban = jax.jit(lambda f, g: bs.sinkhorn_step_walk_banded(
        e, x_sd, y_sd, a_log_f, b_log_f, f, g, tblB, p=p, block=tile))

    S2, T2 = two(f0, g0)
    S1, T1 = ban(f0, g0)
    live_x = np.asarray(a_s) > 0
    live_y = np.asarray(b_s) > 0
    err_row = rel_err(S1, S2, live_x)
    err_col = rel_err(T1, T2, live_y)
    print(json.dumps(dict(
        phase="xy_banded_vs_two_pass", N=N,
        rel_err_row=err_row, rel_err_col=err_col,
    )), flush=True)

    # --- symmetric triangle step vs full sym walk -----------------------
    cxx = jnp.minimum(mask_xx.counts, mask_xx.cols.shape[1])
    tbl_s = bs.walk_plan(mask_xx.cols, cxx, mask_xx.cols.shape[1])
    tblB_s = bs.walk_plan_banded(
        mask_xx.cols, cxx, mask_xx.cols.shape[1], nI_f, tri=True
    )
    faa0 = f_aa_f.astype(jnp.float32)
    sym2 = jax.jit(lambda f: bs.sinkhorn_step_walk(
        e, x_sd, x_sd, a_log_f, a_log_f, f, f, tbl_s, None, p=p,
        block=tile, sym=True)[0])
    sym1 = jax.jit(lambda f: bs.sinkhorn_step_walk_banded_sym(
        e, x_sd, a_log_f, f, tblB_s, p=p, block=tile))
    Ss2 = sym2(faa0)
    Ss1 = sym1(faa0)
    err_sym = rel_err(Ss1, Ss2, live_x)
    print(json.dumps(dict(
        phase="sym_tri_banded_vs_full_walk", N=N, rel_err=err_sym,
    )), flush=True)

    ok = max(err_row, err_col, err_sym) < 1e-4
    row = dict(N=N, phase="banded_onchip_check",
               rel_err_row=err_row, rel_err_col=err_col,
               rel_err_sym=err_sym, ok=bool(ok))
    with open("/root/repo/PROFILE_PHASES.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
