"""Benchmark harness: debiased Sinkhorn divergence + gradient wall-clock.

Reproduces the reference's north-star protocol
(``examples/performances/plot_benchmarks_samplesloss_3D.py``: loss +
gradient wall-clock on 3D point clouds drawn on the unit sphere,
``blur=0.05``, ``scaling=0.5``) at N = 100,000 points per measure on one
TPU chip, through ``backend="auto"`` (which resolves to the multiscale
backend at this size, like the reference's heuristic).

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...,
     "marginal_ms": ..., "loss_value": ..., "loss_rel_err_vs_exact": ...}

``loss_value`` and its relative error against the exact online backend
(same clouds, truncate=None semantics) make every headline row
accuracy-checkable after kernel rewrites — a silent value regression
fails loudly here instead of shipping (round-4 lesson).

``vs_baseline`` is the speedup against the reference GeomLoss online
(KeOps) backend on its documented benchmark GPU (RTX 3090): ~1.4 s for
loss+grad at N = 1e5 (read off the published benchmark curves referenced
in BASELINE.md; the reference repo ships no committed numbers).
"""

import json
import time

import numpy as np

BASELINE_SECONDS = 1.4  # reference online backend, N=1e5, RTX 3090 (see above)
N_POINTS = 100_000


def sphere_cloud(n, seed):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32)


def warm_up_program_load():
    """Load one throwaway program onto the device before timing anything.

    The tunneled TPU runtime's *first* device-program load per process
    takes 10-900 s (nondeterministically), regardless of program content;
    subsequent loads take ~0.1 s. Without this, the first configuration's
    compile/run numbers absorb that infrastructure cost.
    """
    import jax
    import jax.numpy as jnp

    v = jnp.arange(1024, dtype=jnp.float32)
    float(jax.jit(lambda v: (v * 3.0 + 1.0).sum())(v))


def main():
    import jax
    import jax.numpy as jnp

    from geomloss_tpu import SamplesLoss

    warm_up_program_load()

    x = jnp.asarray(sphere_cloud(N_POINTS, 0))
    y = jnp.asarray(sphere_cloud(N_POINTS, 1))

    # backend="auto" resolves to the multiscale backend at this size, exactly
    # like the reference's heuristic (N*M > 10000^2, D<=3, p=2).
    loss = SamplesLoss(
        "sinkhorn", p=2, blur=0.05, diameter=2.0, scaling=0.5, backend="auto"
    )
    step = jax.jit(jax.value_and_grad(lambda x, y: loss(x, y)))

    def run_sync(x, y):
        # N.B.: on tunneled TPU runtimes `block_until_ready` can return
        # before execution has drained; fetching a value to host is the
        # only reliable synchronization. Combine loss and a gradient
        # element on-device so one round trip synchronizes both.
        v, g = step(x, y)
        return float(v + g[0, 0])

    # Warm-up / compile:
    run_sync(x, y)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        run_sync(x, y)
    dt = (time.perf_counter() - t0) / reps

    # The tunneled runtime adds ~43 ms per dispatch; the honest chip
    # figure is the k-chained marginal — k solves chained inside ONE jit
    # (each iteration's input perturbed by the previous value so XLA
    # cannot collapse the chain), timed against the k=1 program:
    def chained(k):
        @jax.jit
        def run(x, y):
            def body(carry, _):
                v, g = jax.value_and_grad(lambda x: loss(x, y))(
                    x + carry * 1e-30
                )
                return v, g[0, 0]
            v, gs = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return v + gs.sum()

        float(run(x, y))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(3):
            float(run(x, y))
        return (time.perf_counter() - t0) / 3

    k = 4
    marginal = (chained(k) - chained(1)) / (k - 1)

    # Accuracy guard: the headline solver's value against the exact
    # (untruncated, streaming) online backend on the same clouds. A
    # kernel rewrite that shifts the value now fails in the headline
    # artifact instead of shipping silently.
    v_fast, _ = step(x, y)
    loss_exact = SamplesLoss(
        "sinkhorn", p=2, blur=0.05, diameter=2.0, scaling=0.5,
        backend="online", truncate=None,
    )
    v_exact = float(jax.jit(loss_exact.__call__)(x, y))
    rel_err = abs(float(v_fast) - v_exact) / max(abs(v_exact), 1e-30)

    print(
        json.dumps(
            {
                "metric": "sinkhorn_divergence_loss+grad_100k_3d_blur0.05",
                "value": round(dt * 1e3, 2),
                "unit": "ms",
                "vs_baseline": round(BASELINE_SECONDS / dt, 3),
                "marginal_ms": round(marginal * 1e3, 2),
                "loss_value": float(v_fast),
                "loss_exact": v_exact,
                "loss_rel_err_vs_exact": round(rel_err, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
