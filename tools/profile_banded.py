"""Banded dual-direction walk vs two-pass walk: rate check on real TPU.

Synthetic diagonal table (40 kept tiles/row at tile=1024) at N=1-2M:
measures ms / 1e10 visited pairs for the two-pass xy step and the banded
single pass, plus a value cross-check.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_banded.py [N]
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


def emit(**kw):
    print("  " + json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def timeit(fn, *args, reps=3):
    out = fn(*args)
    s = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        s += float(
            jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0]
        )
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    warm_up_program_load()
    import geomloss_tpu.ops.block_sparse as bs

    block, keep = 1024, 41
    Np = (N // block) * block
    nI = Np // block
    x = jnp.asarray(sphere_cloud(Np, 0))
    y = jnp.asarray(sphere_cloud(Np, 1))
    f = jnp.zeros((Np,), jnp.float32)
    la = jnp.full((Np,), -np.log(Np), jnp.float32)
    eps = 0.0025

    i = np.arange(nI)[:, None]
    # Symmetric wrap-around window: the kept-pair set equals its own
    # transpose, so the same table serves both walk directions.
    cols = np.sort((i + np.arange(-(keep // 2), keep // 2 + 1)[None, :])
                   % nI, axis=1).astype(np.int32)
    counts = np.full((nI,), keep, np.int32)
    cols, counts = jnp.asarray(cols), jnp.asarray(counts)

    pairs = nI * keep * block * block
    tbl = bs.walk_plan(cols, counts, keep)
    tblT = bs.walk_plan(cols, counts, keep)  # symmetric pattern
    tblB = bs.walk_plan_banded(cols, counts, keep, nI)

    two = jax.jit(lambda f: bs.sinkhorn_step_walk(
        eps, x, y, la, la, f, f, tbl, tblT, p=2, block=block))
    one = jax.jit(lambda f: bs.sinkhorn_step_walk_banded(
        eps, x, y, la, la, f, f, tblB, p=2, block=block))

    t0 = time.perf_counter()
    S1, T1 = one(f)
    jax.block_until_ready((S1, T1))
    compile_banded = time.perf_counter() - t0
    S2, T2 = two(f)
    err_r = float(jnp.abs(S1 - S2).max())
    err_c = float(jnp.abs(T1 - T2).max())
    print(f"  value err row={err_r:.3e} col={err_c:.3e}", flush=True)
    assert err_r < 1e-4 and err_c < 1e-4, "banded mismatch"

    dt2 = timeit(two, f)
    dt1 = timeit(one, f)
    emit(N=Np, phase="xy_step_two_pass", ms=round(dt2, 1),
         ms_per_1e10=round(dt2 / (2 * pairs / 1e10), 1), keep=keep)
    emit(N=Np, phase="xy_step_banded", ms=round(dt1, 1),
         ms_per_1e10=round(dt1 / (pairs / 1e10), 1), keep=keep,
         compile_s=round(compile_banded, 1))
    print(f"  speedup {dt2 / dt1:.2f}x", flush=True)


if __name__ == "__main__":
    main()
