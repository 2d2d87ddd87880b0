"""Dev profiling: where does the online backend's time go at N=100k?"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 100_000


def cloud(n, seed):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return jnp.asarray(v, jnp.float32)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(lambda v: float(jnp.sum(v)), out)  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        s = jax.tree.map(lambda v: float(jnp.sum(v)), out)
    return (time.perf_counter() - t0) / reps * 1e3, s


def main():
    x, y = cloud(N, 0), cloud(N, 1)
    h = jnp.zeros((N,), jnp.float32)
    eps = 0.0025

    from geomloss_tpu.ops.pallas_kernels import lse_pallas, gibbs_apply_pallas
    from geomloss_tpu import SamplesLoss

    # 1. single LSE sweep
    f = jax.jit(lambda x, y, h: lse_pallas(x, y, h, eps, p=2))
    dt, _ = timeit(f, x, y, h)
    print(f"lse_pallas 1e5x1e5 p=2:        {dt:8.2f} ms  ({1e10/dt*1e3/1e12:.2f} Tpair/s)")

    # 2. gibbs_apply with 4 channels (VJP shape)
    V = jnp.ones((N, 4), jnp.float32)
    g = jax.jit(lambda x, y, h, V: gibbs_apply_pallas(x, y, h, h, V, eps, p=2))
    dt, _ = timeit(g, x, y, h, V)
    print(f"gibbs_apply C=4:               {dt:8.2f} ms")

    # 3. VPU exp ceiling: equivalent element count, pure exp+sum in XLA
    z = jnp.ones((32768, 4096), jnp.float32)  # 1.34e8 elements

    @jax.jit
    def expsum(z):
        return jnp.exp(z * 1.0001).sum()

    dt, _ = timeit(expsum, z)
    n_el = z.size
    print(f"XLA exp+sum {n_el:.1e} elems:    {dt:8.2f} ms  ({n_el/dt*1e3/1e12:.2f} Texp/s)")

    # 4. full online loss forward + loss+grad
    loss = SamplesLoss("sinkhorn", p=2, blur=0.05, diameter=2.0, scaling=0.5,
                       backend="online")
    fwd = jax.jit(lambda x, y: loss(x, y))
    dt, v = timeit(fwd, x, y, reps=3)
    print(f"online forward:                {dt:8.2f} ms  (loss={v})")

    step = jax.jit(jax.value_and_grad(lambda x, y: loss(x, y)))
    dt, _ = timeit(step, x, y, reps=3)
    print(f"online loss+grad:              {dt:8.2f} ms")

    # 5. block size sweep for lse_pallas
    for bn, bm in [(256, 2048), (512, 1024), (512, 2048), (512, 4096),
                   (1024, 2048), (1024, 4096), (2048, 2048)]:
        try:
            f = jax.jit(lambda x, y, h: lse_pallas(x, y, h, eps, p=2,
                                                   block_n=bn, block_m=bm))
            dt, _ = timeit(f, x, y, h)
            print(f"lse bn={bn:5d} bm={bm:5d}:        {dt:8.2f} ms")
        except Exception as e:
            print(f"lse bn={bn:5d} bm={bm:5d}:        FAIL {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
