"""Separate per-dispatch overhead from real kernel time on the tunneled TPU."""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 100_000
eps = 0.0025


def cloud(n, seed):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return jnp.asarray(v, jnp.float32)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.tree.map(lambda v: float(jnp.sum(v)), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        s = jax.tree.map(lambda v: float(jnp.sum(v)), out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from geomloss_tpu.ops.pallas_kernels import lse_pallas

    x, y = cloud(N, 0), cloud(N, 1)
    h = jnp.zeros((N,), jnp.float32)

    tiny = jnp.ones((8, 128), jnp.float32)
    t_tiny = timeit(jax.jit(lambda z: z + 1.0), tiny, reps=20)
    print(f"dispatch overhead (tiny add):  {t_tiny:8.2f} ms")

    # k chained LSE sweeps inside ONE jit: marginal cost per sweep
    def chain(k):
        @jax.jit
        def f(x, y, h):
            out = h
            for _ in range(k):
                out = lse_pallas(x, y, out * 1e-6, eps, p=2)
            return out
        return f

    t1 = timeit(chain(1), x, y, h, reps=5)
    t4 = timeit(chain(4), x, y, h, reps=5)
    print(f"1 sweep in jit:                {t1:8.2f} ms")
    print(f"4 sweeps in jit:               {t4:8.2f} ms  -> marginal {(t4-t1)/3:6.2f} ms/sweep")

    # HBM bandwidth check: big copy
    big = jnp.ones((4096, 32768), jnp.float32)  # 536 MB
    t_copy = timeit(jax.jit(lambda z: z * 1.0001), big, reps=5)
    gb = big.size * 4 * 2 / 1e9
    print(f"big elementwise (1 GB moved):  {t_copy:8.2f} ms  ({gb/t_copy*1e3:.0f} GB/s)")

    # pure exp throughput INSIDE one jit, minimal HBM traffic: iterate exp
    z = jnp.ones((1024, 4096), jnp.float32)

    @jax.jit
    def expchain(z):
        def body(c, _):
            return jnp.exp(c * 0.5), None
        c, _ = jax.lax.scan(body, z, None, length=100)
        return c

    t_exp = timeit(expchain, z, reps=5)
    n_exp = z.size * 100
    print(f"chained exp x100 ({n_exp:.1e}):   {t_exp:8.2f} ms  ({n_exp/t_exp*1e3/1e9:.1f} Gexp/s)")


if __name__ == "__main__":
    main()
