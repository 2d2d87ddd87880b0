"""Profile the geomloss_tpu routines
===================================

How to **profile** the geometric losses to pick the backend and
scaling/truncation values best suited to your data: wrap the calls in a
``jax.profiler`` trace and open the result in Perfetto
(https://ui.perfetto.dev) or TensorBoard.

TPU-native counterpart of the reference's
``examples/performances/plot_profile.py`` (torch autograd profiler +
``chrome://tracing`` there). Run:

    python examples/plot_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss
from geomloss_tpu.utils.profiling import Timer
from _example_utils import size

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def sphere(n, seed):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3).astype(np.float32)
    v /= 2 * np.linalg.norm(v, axis=1, keepdims=True)
    return jnp.asarray(v)


def main():
    # On a real TPU chip, bump this to 100_000 like the reference:
    N = size(20_000, 400)
    x, y = sphere(N, 0), sphere(N, 1)

    timings = {}
    for loss_name in ["gaussian", "sinkhorn"]:
        for backend in ["online", "multiscale"]:
            loss = SamplesLoss(
                loss_name, blur=0.05, backend=backend, truncate=3,
                diameter=1.0, scaling=0.5,
            )
            step = jax.jit(jax.value_and_grad(lambda x, y: loss(x, y)))

            # Warm-up compile outside the trace (compilation would dwarf
            # the execution timeline otherwise):
            v, g = step(x, y)
            float(v + g[0, 0])  # host fetch = reliable synchronization

            trace_dir = os.path.join(OUT, f"profile_{loss_name}_{backend}")
            os.makedirs(trace_dir, exist_ok=True)
            t = Timer().start()
            with jax.profiler.trace(trace_dir):
                v, g = step(x, y)
                t.stop(v + g[0, 0])
            timings[f"{loss_name}_{backend}"] = t.elapsed
            print(
                f"{loss_name:>9s} / {backend:<10s}: {t.elapsed * 1e3:8.2f} ms, "
                f"cost = {float(v):.6f}"
            )

    print(
        "\nTraces written under examples/output/profile_*/ — load the "
        ".trace.json.gz files at https://ui.perfetto.dev (or point "
        "TensorBoard's profile plugin at the directory)."
    )
    return timings


if __name__ == "__main__":
    main()
