"""Isolate the C=4 sparse gradient apply (the last-extrapolation backward).

The round-4 2M phase breakdown pinned the differentiable extrapolation's
fwd+bwd at 2591 ms of a 4037 ms solve; the backward is 4 gradient applies
(``_extrap_dx_walk``), each a ``gibbs_apply_walk`` with C = 1 + D = 4
channels. This measures, per apply, on like-for-like tables:

  fwd_pair      sinkhorn_step_walk (both directions; 2 traversals)
  apply_c1      gibbs_apply_walk C=1 (the forward-equivalent traversal)
  apply_c4      gibbs_apply_walk C=4 (the gradient apply)
  extrap_bwd    full grad of softmin_extrapolation_walk (2 applies)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_grad_apply.py [N]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import sphere_cloud, warm_up_program_load


def timeit(fn, *args, reps=3):
    out = fn(*args)
    s = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        s += float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    warm_up_program_load()

    from geomloss_tpu.models import multiscale as ms
    from geomloss_tpu.ops import block_sparse as bs
    from geomloss_tpu.solvers.sinkhorn_loop import log_weights

    p, blur = 2, 0.05
    tile = ms.auto_tile(N)
    a = jnp.ones((N,), jnp.float32) / N
    x = jnp.asarray(sphere_cloud(N, 0))
    y = jnp.asarray(sphere_cloud(N, 1))
    cs = ms.default_cluster_scale(2.0, 3)
    (aw, a_s), (xc, x_s), _ = ms.spatial_sort_blocks(a, x, cs, 2.0, 512,
                                                     pad_multiple=tile)
    (bw, b_s), (yc, y_s), _ = ms.spatial_sort_blocks(a, y, cs, 2.0, 512,
                                                     pad_multiple=tile)
    Npad = x_s.shape[0]
    a_log = log_weights(a_s)
    b_log = log_weights(b_s)
    f0 = jnp.zeros((Npad,), jnp.float32)
    eps = blur**2 * 2  # ~first fine temperature

    cap_m = ms.mid_cap(Npad, tile)
    mask = jax.jit(lambda: bs.build_tile_masks(
        x_s, y_s, f0, f0, eps, p, 5, tile, cap=cap_m, w_x=a_s, w_y=b_s))()
    kept = float(mask.counts.mean())
    t_mean = max(16, 5 * cap_m // 8)
    tbl = bs.walk_plan(mask.cols, mask.counts, t_mean)
    tblT = bs.walk_plan(mask.colsT, mask.countsT, t_mean)
    print(f"Npad={Npad} tile={tile} cap={cap_m} kept_mean={kept:.1f} "
          f"tbl={tbl.shape}", flush=True)

    rows = []

    def emit(**kw):
        rows.append(dict(N=N, **kw))
        print("  " + json.dumps(rows[-1]), flush=True)

    # Forward pair step (2 traversals):
    fn = jax.jit(lambda f, g: bs.sinkhorn_step_walk(
        eps, x_s, y_s, a_log, b_log, f, g, tbl, tblT, p=p, block=tile))
    emit(phase="fwd_pair_step", ms=round(timeit(fn, f0, f0), 1),
         kept_mean=round(kept, 1))

    # C=1 apply:
    fn1 = jax.jit(lambda v: bs.gibbs_apply_walk(
        x_s, y_s, a_log, b_log, v, eps, tbl, p=p, kind="gibbs",
        block_n=tile, block_m=tile))
    v1 = jnp.ones((Npad, 1), jnp.float32)
    emit(phase="apply_c1", ms=round(timeit(fn1, v1), 1))

    # C=4 apply (the gradient shape):
    v4 = jnp.concatenate([jnp.ones((Npad, 1), jnp.float32), y_s], axis=-1)
    fn4 = jax.jit(lambda v: bs.gibbs_apply_walk(
        x_s, y_s, a_log, b_log, v, eps, tbl, p=p, kind="gibbs",
        block_n=tile, block_m=tile))
    emit(phase="apply_c4", ms=round(timeit(fn4, v4), 1))

    # Full extrapolation fwd+bwd (2 applies in the bwd):
    def ex_loss(xx, yy):
        S_xy, S_yx = bs.softmin_extrapolation_walk(
            xx, yy, f0, f0, a_log, b_log, eps, tbl, tblT, p, tile)
        return (a_s * S_xy).sum() + (b_s * S_yx).sum()
    gfn = jax.jit(jax.grad(ex_loss, argnums=(0, 1)))
    emit(phase="extrap_walk_fwd_bwd", ms=round(timeit(gfn, x_s, y_s, reps=2), 1))

    with open("/root/repo/PROFILE_PHASES.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
