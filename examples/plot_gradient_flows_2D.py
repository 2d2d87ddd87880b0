"""Comparing loss landscapes: gradient flows in 2D
================================================

Drive the same source cloud toward a target with four different
geometric losses — energy distance, Gaussian MMD, Laplacian MMD and the
debiased Sinkhorn divergence — and compare the trajectories.

TPU-native counterpart of the reference's
``examples/comparisons/plot_gradient_flows_2D.py``. Run:

    python examples/plot_gradient_flows_2D.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss
from _example_utils import annulus, crescent, get_pyplot, savefig, size


LOSSES = {
    "energy": dict(loss="energy"),
    "gaussian (blur=.1)": dict(loss="gaussian", blur=0.1),
    "laplacian (blur=.1)": dict(loss="laplacian", blur=0.1),
    "sinkhorn (blur=.01)": dict(
        loss="sinkhorn", p=2, blur=0.01, diameter=2.0, scaling=0.9
    ),
}


def main():
    N = size(1500)
    x0 = jnp.asarray(annulus(N, seed=5))
    y = jnp.asarray(crescent(N, seed=6))
    n_steps = size(60, 8)

    trajectories = {}
    finals = {}
    for name, kw in LOSSES.items():
        loss = SamplesLoss(**kw)

        @jax.jit
        def step(x):
            val, g = jax.value_and_grad(lambda x: loss(x, y))(x)
            return val, x - 0.05 * N * g

        x = x0
        snaps = [np.asarray(x)]
        for i in range(n_steps):
            val, x = step(x)
            if (i + 1) % max(1, n_steps // 3) == 0:
                snaps.append(np.asarray(x))
        trajectories[name] = snaps
        finals[name] = float(val)
        print(f"{name:22s}: final loss = {finals[name]:+.3e}")

    plt = get_pyplot()
    if plt is not None:
        n_snap = min(len(s) for s in trajectories.values())
        fig, axes = plt.subplots(
            len(LOSSES), n_snap, figsize=(2.6 * n_snap, 2.6 * len(LOSSES))
        )
        for r, (name, snaps) in enumerate(trajectories.items()):
            for c in range(n_snap):
                ax = axes[r, c]
                ax.scatter(*np.asarray(y).T, s=2, c="tab:red", alpha=0.3)
                ax.scatter(*snaps[c].T, s=2, c="tab:blue")
                ax.set_xticks([]), ax.set_yticks([])
                if c == 0:
                    ax.set_ylabel(name, fontsize=8)
        savefig(plt, "gradient_flows_2D.png")

    return finals


if __name__ == "__main__":
    main()
