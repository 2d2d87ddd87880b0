"""Multiscale OT with user-supplied clusters (the 6-argument form)
=================================================================

The multiscale backend normally clusterizes with a spatial sort; passing
explicit integer labels instead makes the coarse phase operate on
*semantic* clusters: ``loss(l_x, a, x, l_y, b, y)``.

TPU-native counterpart of the reference's
``examples/sinkhorn_multiscale/plot_optimal_transport_cluster.py``. Run:

    python examples/plot_optimal_transport_cluster.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss
from _example_utils import gaussian_mixture, get_pyplot, savefig, size


def main():
    N = size(4000)
    x, l_x = gaussian_mixture(
        N, [(0.2, 0.2), (0.7, 0.25), (0.45, 0.8)], 0.06, seed=3
    )
    y, l_y = gaussian_mixture(
        N, [(0.3, 0.3), (0.8, 0.4), (0.5, 0.7)], 0.06, seed=4
    )
    a = jnp.full((N,), 1.0 / N, jnp.float32)
    b = jnp.full((N,), 1.0 / N, jnp.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    lxj, lyj = jnp.asarray(l_x, jnp.int32), jnp.asarray(l_y, jnp.int32)

    loss = SamplesLoss(
        "sinkhorn", p=2, blur=0.05, scaling=0.8, diameter=2.0,
        backend="multiscale", verbose=True,
    )
    v_labeled = float(loss(lxj, a, xj, lyj, b, yj))  # 6-arg labeled form
    v_plain = float(loss(a, xj, b, yj))  # spatial clusterization
    print(f"labeled-cluster value : {v_labeled:.8f}")
    print(f"spatial-cluster value : {v_plain:.8f}")
    print(f"relative difference   : {abs(v_labeled - v_plain) / abs(v_plain):.2e}")

    plt = get_pyplot()
    if plt is not None:
        colors = np.array([[0.85, 0.3, 0.3], [0.3, 0.6, 0.85], [0.4, 0.75, 0.4]])
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.scatter(*x.T, s=5, c=colors[l_x], marker="o", alpha=0.7)
        ax.scatter(*y.T, s=5, c=colors[l_y], marker="x", alpha=0.7)
        ax.set_title("Cluster-labeled source (o) and target (x)")
        savefig(plt, "optimal_transport_cluster.png")

    return abs(v_labeled - v_plain) / abs(v_plain)


if __name__ == "__main__":
    main()
