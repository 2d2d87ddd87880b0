"""Round-3 profiling: where does the multiscale backend spend time at 1M-4M?

Times (on real TPU, one process, warm):
  1. full loss+grad at N (baseline refresh)
  2. components: sort, coarse phase, mask build, one fine sweep per eps,
     extrapolation fwd, extrapolation fwd+bwd
  3. sparse-traversal per-step overhead at tile 512/1024/2048/4096
  4. K=18 (split-exact) vs K=3 (plain bf16) dense absorbed step

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_multiscale_r3.py [N]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import sphere_cloud, warm_up_program_load


def timeit(fn, *args, reps=3, label=""):
    """Time a jitted fn; sync by fetching a scalar to host."""
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    compile_s = 0.0
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:55s} {dt*1e3:9.1f} ms")
    return dt


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    s = 0.0
    for l in leaves[:2]:
        s += float(jnp.asarray(l).reshape(-1)[0])
    return s


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    warm_up_program_load()
    print(f"== N = {N} ==")

    x = jnp.asarray(sphere_cloud(N, 0))
    y = jnp.asarray(sphere_cloud(N, 1))

    from geomloss_tpu.models import multiscale as ms
    from geomloss_tpu.ops import block_sparse as bs
    from geomloss_tpu.solvers.annealing import scaling_parameters
    from geomloss_tpu.solvers.sinkhorn_loop import log_weights

    p, blur, scaling = 2, 0.05, 0.5
    a = jnp.ones((N,), jnp.float32) / N
    b = jnp.ones((N,), jnp.float32) / N

    diameter, eps, eps_list, rho = scaling_parameters(
        x, y, p, blur, None, 2.0, scaling
    )
    print(f"eps_list: {[round(e,5) for e in eps_list]}")
    cluster_scale = ms.default_cluster_scale(diameter, 3)
    jump = ms.jump_index(eps_list, cluster_scale, p)
    print(f"cluster_scale={cluster_scale:.4f}, jump={jump}, "
          f"fine eps: {[round(e,5) for e in eps_list[jump+1:]]}")

    import os
    if os.environ.get("SKIP_FULL"):
        pass
    # --- 1. full loss+grad baseline ---
    if not os.environ.get("SKIP_FULL"):
        from geomloss_tpu import SamplesLoss
        loss = SamplesLoss("sinkhorn", p=2, blur=blur, diameter=2.0,
                           scaling=scaling, backend="multiscale")
        step = jax.jit(jax.value_and_grad(lambda x, y: loss(x, y)))
        timeit(step, x, y, reps=1, label="full loss+grad (current)")

    # --- 2. components ---
    tile = ms.auto_tile(N)
    block_size = 1
    while (block_size * 2 <= tile and N // (block_size * 2) >= 2000):
        block_size *= 2
    print(f"tile={tile}, block_size={block_size}")

    sort_fn = jax.jit(lambda a, x: ms.spatial_sort_blocks(
        a, x, cluster_scale, diameter, block_size, pad_multiple=tile))
    timeit(sort_fn, a, x, label="spatial_sort_blocks (one cloud)")

    (aw_c, a_s), (x_c, x_s), perm_x = sort_fn(a, x)
    (bw_c, b_s), (y_c, y_s), perm_y = sort_fn(b, y)
    a_log_f, b_log_f = log_weights(a_s), log_weights(b_s)
    Npad = x_s.shape[0]
    print(f"Npad={Npad}, coarse K={x_c.shape[0]}")

    # fake coarse potentials (roughly correct scale):
    f_c = jnp.zeros(x_c.shape[0], jnp.float32)
    g_c = jnp.zeros(y_c.shape[0], jnp.float32)
    eps_j = eps_list[jump]
    bpt = tile // block_size

    mask_fn = jax.jit(lambda: bs.masks_from_coarse(
        x_c, y_c, f_c, g_c, aw_c, bw_c, eps_j, p, 5, bpt))
    timeit(mask_fn, label=f"masks_from_coarse (bpt={bpt})")
    mask_xy = mask_fn()
    cap0 = mask_xy.cols.shape[1]
    kept = float(mask_xy.counts.mean())
    print(f"cap0={cap0}, mean kept tiles/row={kept:.1f} of nJ={Npad//tile}")

    f0 = jnp.zeros(Npad, jnp.float32)
    g0 = jnp.zeros(Npad, jnp.float32)

    for e in eps_list[jump + 1:]:
        d = 5 * (e - eps_j)
        cnt = jnp.minimum(bs.retighten_counts(mask_xy.vals, d), cap0)
        cntT = jnp.minimum(bs.retighten_counts(mask_xy.valsT, d), cap0)
        m = mask_xy.with_counts(cnt, cntT)
        step_fn = jax.jit(lambda f, g, m=m, e=e: bs.sinkhorn_step_sparse(
            e, x_s, y_s, a_log_f, b_log_f, f, g, m, p=p, block=tile))
        timeit(step_fn, f0, g0, label=f"sinkhorn_step_sparse xy pair eps={e:.5f} "
               f"(kept={float(cnt.mean()):.0f})")

    # extrapolation fwd
    e_last = eps_list[-1]
    d = 5 * (e_last - eps_j)
    cnt = jnp.minimum(bs.retighten_counts(mask_xy.vals, d), cap0)
    cntT = jnp.minimum(bs.retighten_counts(mask_xy.valsT, d), cap0)
    ex_fn = jax.jit(lambda f, g: bs.softmin_extrapolation_sparse(
        x_s, y_s, f, g, a_log_f, b_log_f, e_last,
        mask_xy.cols, cnt, mask_xy.colsT, cntT, p, tile))
    timeit(ex_fn, f0, g0, label="extrapolation fwd (xy pair)")

    def ex_loss(xx, yy):
        S_xy, S_yx = bs.softmin_extrapolation_sparse(
            xx, yy, f0, g0, a_log_f, b_log_f, e_last,
            mask_xy.cols, cnt, mask_xy.colsT, cntT, p, tile)
        return (a_s * S_xy).sum() + (b_s * S_yx).sum()
    ex_grad = jax.jit(jax.grad(ex_loss, argnums=(0, 1)))
    timeit(ex_grad, x_s, y_s, label="extrapolation fwd+bwd (xy pair)")

    # --- 3. per-step overhead sweep over tile size ---
    if os.environ.get("SKIP_TILES"):
        return
    print("-- sparse traversal overhead vs tile (xy absorbed pair) --")
    for t_try in (512, 1024, 2048, 4096):
        if Npad % t_try or Npad // t_try > 8192:
            continue
        nI = Npad // t_try
        if nI < 2:
            continue
        bpt_t = t_try // block_size
        if bpt_t < 1:
            continue
        mk = jax.jit(lambda t_try=t_try, bpt_t=bpt_t: bs.masks_from_coarse(
            x_c, y_c, f_c, g_c, aw_c, bw_c, eps_j, p, 5, bpt_t))
        try:
            m_t = mk()
        except Exception as ex:
            print(f"  tile={t_try}: mask build failed: {str(ex)[:80]}")
            continue
        d = 5 * (e_last - eps_j)
        cnt_t = jnp.minimum(bs.retighten_counts(m_t.vals, d), m_t.cols.shape[1])
        cntT_t = jnp.minimum(bs.retighten_counts(m_t.valsT, d), m_t.cols.shape[1])
        m_t = m_t.with_counts(cnt_t, cntT_t)
        kept_t = float(cnt_t.mean())
        steps = nI * m_t.cols.shape[1]
        pairs = nI * kept_t * t_try * t_try
        try:
            fn = jax.jit(lambda f, g, m_t=m_t, t_try=t_try:
                         bs.sinkhorn_step_sparse(
                             e_last, x_s, y_s, a_log_f, b_log_f, f, g, m_t,
                             p=p, block=t_try))
            dt = timeit(fn, f0, g0,
                        label=f"tile={t_try} cap={m_t.cols.shape[1]} "
                        f"kept={kept_t:.0f} steps={steps} pairs={pairs:.2e}")
        except Exception as ex:
            print(f"  tile={t_try}: step failed: {str(ex)[:120]}")

    # --- 4. precision-scheduling hypothesis: K=18 vs K=3 dense step ---
    print("-- dense absorbed pair step: split-exact vs plain bf16 --")
    from geomloss_tpu.ops.pallas_kernels import sinkhorn_step_pallas
    n_small = min(N, 100_000)
    xs_ = x[:n_small]
    ys_ = y[:n_small]
    la = jnp.full((n_small,), -np.log(n_small), jnp.float32)
    fz = jnp.zeros((n_small,), jnp.float32)
    fn18 = jax.jit(lambda f, g: sinkhorn_step_pallas(
        xs_, ys_, f, g, la, la, 0.05, p=2))
    timeit(fn18, fz, fz, reps=5, label=f"sinkhorn_step_pallas K=18 N={n_small}")


if __name__ == "__main__":
    main()
