"""Kernel-variant profiling: what does each per-pair op cost in the LSE sweep?"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 100_352  # multiple of 1024
BN, BM = 1024, 2048
NEG_INF = -1e30


def cloud(n, seed):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return jnp.asarray(v, jnp.float32)


def make_kernel(variant):
    def kern(xT_ref, yT_ref, h_ref, o_ref, m_ref, s_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            s_ref[:] = jnp.zeros_like(s_ref)

        scores = lax.dot_general(
            xT_ref[:], yT_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        arg = h_ref[:] + scores  # bias prefolded, 1/eps prefolded into x

        if variant == "full":
            m_prev = m_ref[:]
            blk = jnp.max(arg, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, blk)
            s_ref[:] = s_ref[:] * jnp.exp(m_prev - m_new) + jnp.sum(
                jnp.exp(arg - m_new), axis=1, keepdims=True)
            m_ref[:] = m_new
        elif variant == "full_exp2":
            m_prev = m_ref[:]
            blk = jnp.max(arg, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, blk)
            s_ref[:] = s_ref[:] * jnp.exp2(m_prev - m_new) + jnp.sum(
                jnp.exp2(arg - m_new), axis=1, keepdims=True)
            m_ref[:] = m_new
        elif variant == "no_max":
            s_ref[:] = s_ref[:] + jnp.sum(jnp.exp(arg), axis=1, keepdims=True)
            m_ref[:] = jnp.zeros_like(m_ref)
        elif variant == "no_exp":
            m_prev = m_ref[:]
            blk = jnp.max(arg, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, blk)
            s_ref[:] = s_ref[:] * (m_prev - m_new) + jnp.sum(
                (arg - m_new), axis=1, keepdims=True)
            m_ref[:] = m_new
        elif variant == "sum_only":
            s_ref[:] = s_ref[:] + jnp.sum(arg, axis=1, keepdims=True)
            m_ref[:] = jnp.zeros_like(m_ref)
        elif variant == "mxu_sum":
            # exp -> MXU matvec against ones for the row sum
            m_prev = m_ref[:]
            blk = jnp.max(arg, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, blk)
            e = jnp.exp(arg - m_new)
            ones = jnp.ones((BM, 1), jnp.float32)
            s_ref[:] = s_ref[:] * jnp.exp(m_prev - m_new) + lax.dot_general(
                e, ones, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:] = m_new
        elif variant == "schraudolph":
            # exp(x) ~= bitcast(int32(a*x + b)): 1 FMA + bitcast
            m_prev = m_ref[:]
            blk = jnp.max(arg, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, blk)
            A = jnp.float32(12102203.0)  # 2^23 / ln 2
            B = jnp.float32(1064986816.0)  # 127 * 2^23 - 60801*8
            z = arg - m_new
            approx = lax.bitcast_convert_type(
                (A * z + B).astype(jnp.int32), jnp.float32)
            s_ref[:] = s_ref[:] * jnp.exp(m_prev - m_new) + jnp.sum(
                approx, axis=1, keepdims=True)
            m_ref[:] = m_new

        @pl.when(j == nj - 1)
        def _fin():
            o_ref[:] = m_ref[:] + jnp.log(jnp.maximum(s_ref[:], 1e-30))

    return kern


def build(variant, bn=BN, bm=BM):
    @jax.jit
    def f(xT, yT, h):
        grid = (N // bn, N // bm)
        return pl.pallas_call(
            make_kernel(variant),
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bn, 1), jnp.float32),
                            pltpu.VMEM((bn, 1), jnp.float32)],
        )(xT, yT, h)
    return f


def timeit(fn, *args, reps=10):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        s = float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    x, y = cloud(N, 0), cloud(N, 1)
    eps = 0.0025
    xT = (x / eps).T  # (3, N), 1/eps folded
    yT = y.T
    h = jnp.zeros((1, N), jnp.float32)

    base = None
    for v in ["full", "full_exp2", "no_max", "no_exp", "sum_only", "mxu_sum",
              "schraudolph"]:
        try:
            dt = timeit(build(v), xT, yT, h)
            if v == "full":
                base = dt
            print(f"{v:12s}: {dt:8.2f} ms   ({1e10/dt*1e3/1e12:.2f} Tpair/s)")
        except Exception as e:
            print(f"{v:12s}: FAIL {type(e).__name__}: {str(e)[:100]}")

    # block sweep on the full variant
    for bn, bm in [(512, 2048), (1024, 1024), (1024, 2048), (2048, 1024),
                   (512, 4096), (1024, 3584), (896, 2048)]:
        if N % bn or N % bm:
            continue
        try:
            dt = timeit(build("full", bn, bm), xT, yT, h)
            print(f"full bn={bn:5d} bm={bm:5d}: {dt:8.2f} ms")
        except Exception as e:
            print(f"full bn={bn:5d} bm={bm:5d}: FAIL {str(e)[:80]}")


if __name__ == "__main__":
    main()


def build_twophase(bn=512, bm=2048):
    LOG2E = float(np.log2(np.e))

    def kern(xT_ref, yT_ref, h_ref, o_ref, m_ref, s_ref):
        ph = pl.program_id(0)
        j = pl.program_id(2)
        nj = pl.num_programs(2)
        i = pl.program_id(1)

        scores = lax.dot_general(
            xT_ref[:], yT_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        arg = h_ref[:] + scores

        @pl.when(ph == 0)
        def _maxpass():
            blk = jnp.max(arg, axis=1, keepdims=True)

            @pl.when(j == 0)
            def _():
                m_ref[pl.ds(i * bn, bn), :] = blk

            @pl.when(j > 0)
            def _():
                m_ref[pl.ds(i * bn, bn), :] = jnp.maximum(
                    m_ref[pl.ds(i * bn, bn), :], blk)

        @pl.when(ph == 1)
        def _sumpass():
            m = m_ref[pl.ds(i * bn, bn), :]

            @pl.when(j == 0)
            def _():
                s_ref[:] = jnp.zeros_like(s_ref)

            s_ref[:] += jnp.sum(jnp.exp2((arg - m) * LOG2E), axis=1,
                                keepdims=True)

            @pl.when(j == nj - 1)
            def _():
                o_ref[:] = m + jnp.log(jnp.maximum(s_ref[:], 1e-30))

    @jax.jit
    def f(xT, yT, h):
        grid = (2, N // bn, N // bm)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, bn), lambda p, i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, bm), lambda p, i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm), lambda p, i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bn, 1), lambda p, i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((N, 1), jnp.float32),
                            pltpu.VMEM((bn, 1), jnp.float32)],
        )(xT, yT, h)
    return f


def check_and_time():
    x, y = cloud(N, 0), cloud(N, 1)
    eps = 0.0025
    xT = (x / eps).T
    yT = y.T
    h = jnp.zeros((1, N), jnp.float32)
    ref = build("full")(xT, yT, h)
    for bn, bm in [(512, 2048), (1024, 2048), (512, 4096), (896, 2048),
                   (512, 1024), (256, 2048)]:
        if N % bn or N % bm:
            continue
        try:
            f = build_twophase(bn, bm)
            out = f(xT, yT, h)
            err = float(jnp.max(jnp.abs(out - ref)))
            dt = timeit(f, xT, yT, h)
            print(f"twophase bn={bn:5d} bm={bm:5d}: {dt:8.2f} ms  maxerr={err:.2e}")
        except Exception as e:
            print(f"twophase bn={bn:5d} bm={bm:5d}: FAIL {str(e)[:120]}")


check_and_time()
