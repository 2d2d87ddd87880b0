"""Extended benchmark suite: reproduces the reference's benchmark protocol
(``examples/performances/plot_benchmarks_samplesloss_3D.py``): loss +
gradient wall-clock on 3D unit-sphere clouds, N sweep, for the Sinkhorn
(blur .05), Gaussian MMD (blur .1) and energy-distance losses.

Prints one JSON line per configuration. ``bench.py`` remains the
single-line driver entry point.
"""

import json
import time

import numpy as np

from bench import sphere_cloud, warm_up_program_load

MAXTIME = 60.0  # seconds per config, like the reference's MAXTIME guard


RESULTS = {}


def run_config(name, make_step, ns):
    import jax
    import jax.numpy as jnp

    for n in ns:
        x = jnp.asarray(sphere_cloud(n, 0))
        y = jnp.asarray(sphere_cloud(n, 1))
        step = make_step(n)
        try:
            t0 = time.perf_counter()
            v, g = step(x, y)
            sync = float(v + g[0, 0])  # one host fetch: see bench.py
            compile_s = time.perf_counter() - t0
            reps = 3 if n <= 200_000 else 1
            t0 = time.perf_counter()
            for _ in range(reps):
                v, g = step(x, y)
                sync = float(v + g[0, 0])
            dt = (time.perf_counter() - t0) / reps
        except Exception as e:  # noqa: BLE001 - report and move on
            print(json.dumps({"metric": f"{name}_N{n}", "error": str(e)[:200]}))
            continue
        RESULTS[f"{name}_N{n}"] = dt * 1e3
        print(
            json.dumps(
                {
                    "metric": f"{name}_N{n}",
                    "value": round(dt * 1e3, 2),
                    "unit": "ms",
                    "compile_s": round(compile_s, 1),
                    "loss_value": float(v),
                }
            ),
            flush=True,
        )
        if dt > MAXTIME:
            break


def main():
    import jax
    from geomloss_tpu import SamplesLoss

    # First device-program load pays a 10-900 s infrastructure cost on
    # the tunneled runtime (see bench.py::warm_up_program_load):
    warm_up_program_load()

    def sinkhorn_step(backend, blur):
        def make(n):
            loss = SamplesLoss(
                "sinkhorn", p=2, blur=blur, diameter=2.0, scaling=0.5,
                backend=backend,
            )
            return jax.jit(jax.value_and_grad(lambda x, y: loss(x, y)))

        return make

    def kernel_step(name, blur, backend="online", truncate=5):
        def make(n):
            loss = SamplesLoss(
                name, blur=blur, backend=backend, truncate=truncate,
                diameter=2.0,
            )
            return jax.jit(jax.value_and_grad(lambda x, y: loss(x, y)))

        return make

    # Reference protocol (plot_benchmarks_samplesloss_3D.py:24-45): Sinkhorn
    # at blur .05 AND .01, MMDs at their default blurs, N sweep from 1e2
    # to millions. The small-N rows are dispatch-floor-dominated on the
    # tunneled runtime (~43 ms per dispatch; see bench.py's k-chained
    # marginal for the device-only figure) — they make that floor explicit
    # rather than hiding it, like the reference's MAXTIME framing.
    run_config(
        "sinkhorn_tensorized_blur.05",
        sinkhorn_step("tensorized", 0.05),
        [100, 1_000],
    )
    run_config(
        "sinkhorn_multiscale_blur.05",
        sinkhorn_step("multiscale", 0.05),
        [10_000, 100_000, 1_000_000, 2_000_000, 4_000_000],
    )
    run_config(
        "sinkhorn_multiscale_blur.01",
        sinkhorn_step("multiscale", 0.01),
        [10_000, 100_000, 1_000_000],
    )
    run_config(
        "sinkhorn_online_blur.05",
        sinkhorn_step("online", 0.05),
        [10_000, 100_000],
    )
    run_config(
        "sinkhorn_online_blur.01",
        sinkhorn_step("online", 0.01),
        [10_000, 100_000],
    )
    run_config(
        "gaussian_mmd_blur.1",
        kernel_step("gaussian", 0.1),
        [10_000, 100_000],
    )
    # The reference protocol benches the gaussian kernel with truncation
    # (plot_benchmarks_samplesloss_3D.py:206: blur .1, truncate 3);
    # that is the backend that reaches 1M+ points.
    run_config(
        "gaussian_mmd_multiscale_blur.1",
        kernel_step("gaussian", 0.1, backend="multiscale", truncate=3),
        [100_000, 1_000_000],
    )
    run_config("energy_mmd", kernel_step("energy", None), [10_000, 100_000])

    # The reference's headline ε-scaling claim: tightening blur .05 -> .01
    # costs only ~2x (plot_benchmarks_ot_3D.py:488-492), not the ~25x a
    # fixed-temperature Sinkhorn would pay.
    for backend in ("multiscale", "online"):
        for n in (100_000, 1_000_000):
            t05 = RESULTS.get(f"sinkhorn_{backend}_blur.05_N{n}")
            t01 = RESULTS.get(f"sinkhorn_{backend}_blur.01_N{n}")
            if t05 and t01:
                print(
                    json.dumps(
                        {
                            "metric": f"blur.01_over_.05_{backend}_N{n}",
                            "value": round(t01 / t05, 2),
                            "unit": "x",
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
