"""Wasserstein interpolation between 3D shapes
============================================

Deform a sphere into a torus by following the Wasserstein-2 gradient flow
of the debiased Sinkhorn divergence, and snapshot the displacement
interpolation along the way.

TPU-native counterpart of the reference's
``examples/optimal_transport/plot_interpolation_3D.py`` (which loads
triangle meshes; we sample the surfaces procedurally). Run:

    python examples/plot_interpolation_3D.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss
from _example_utils import get_pyplot, savefig, size, sphere_3d, torus_3d


def main():
    N = size(20_000, 1500)
    x0 = jnp.asarray(sphere_3d(N, seed=0))
    y = jnp.asarray(torus_3d(N, seed=1))

    loss = SamplesLoss("sinkhorn", p=2, blur=0.01, diameter=2.0, scaling=0.7)

    @jax.jit
    def step(x):
        val, g = jax.value_and_grad(lambda x: loss(x, y))(x)
        return val, x - N * g  # a_i = 1/N: W2 gradient flow, unit step

    snapshots = [np.asarray(x0)]
    x = x0
    n_steps = 6
    for i in range(n_steps):
        val, x = step(x)
        print(f"step {i}: S_eps = {float(val):.3e}")
        snapshots.append(np.asarray(x))

    plt = get_pyplot()
    if plt is not None:
        fig = plt.figure(figsize=(16, 3))
        for k, snap in enumerate(snapshots[:: max(1, len(snapshots) // 5)][:5]):
            ax = fig.add_subplot(1, 5, k + 1, projection="3d")
            ax.scatter(*snap.T, s=1, c=snap[:, 2], cmap="viridis")
            ax.set_title(f"t = {k}/4")
            ax.set_axis_off()
        savefig(plt, "interpolation_3D.png")

    return float(val)


if __name__ == "__main__":
    main()
