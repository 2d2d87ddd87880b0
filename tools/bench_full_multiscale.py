"""Lean full-solve measurement: multiscale loss+grad at one N.

One row per run (appended to PROFILE_PHASES.jsonl): wall-clock, compile
time, loss value. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_full_multiscale.py N [blur]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import sphere_cloud, warm_up_program_load


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    blur = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
    warm_up_program_load()

    from geomloss_tpu import SamplesLoss

    x = jnp.asarray(sphere_cloud(N, 0))
    y = jnp.asarray(sphere_cloud(N, 1))
    loss = SamplesLoss("sinkhorn", p=2, blur=blur, diameter=2.0,
                       scaling=0.5, backend="multiscale")
    step = jax.jit(jax.value_and_grad(lambda x, y: loss(x, y)))

    t0 = time.perf_counter()
    v, g = step(x, y)
    sync = float(v + g[0, 0])
    compile_s = time.perf_counter() - t0

    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = step(x, y)
        sync = float(v + g[0, 0])
    dt = (time.perf_counter() - t0) / reps * 1e3

    row = dict(N=N, phase="full_loss_grad", blur=blur, ms=round(dt, 1),
               compile_s=round(compile_s, 1), loss_value=float(v))
    print(json.dumps(row), flush=True)
    with open("/root/repo/PROFILE_PHASES.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
