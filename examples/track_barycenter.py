"""Barycenter of fiber tracks
===========================

Compute a Wasserstein barycenter of several subjects' fiber bundles by
gradient descent: start from one subject's cloud and minimize the sum of
debiased Sinkhorn divergences to all subjects.

TPU-native counterpart of the reference's
``examples/brain_tractograms/track_barycenter.py``. Run:

    python examples/track_barycenter.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss
from _example_utils import fibers_3d, get_pyplot, savefig, size


def main():
    n_fibers = size(400, 30)
    subjects = [
        jnp.asarray(fibers_3d(n_fibers, 20, seed=s, bundle=0)[0])
        for s in range(4)
    ]
    print(f"4 subjects, {subjects[0].shape[0]:,} points each")

    loss = SamplesLoss("sinkhorn", p=2, blur=0.02, diameter=2.0, scaling=0.7)

    @jax.jit
    def step(x):
        def total(x):
            return sum(loss(x, y) for y in subjects) / len(subjects)

        val, g = jax.value_and_grad(total)(x)
        return val, x - x.shape[0] * g

    x = subjects[0]
    for i in range(size(12, 4)):
        val, x = step(x)
        print(f"step {i}: mean divergence = {float(val):.3e}")

    bar = np.asarray(x)
    plt = get_pyplot()
    if plt is not None:
        fig = plt.figure(figsize=(10, 5))
        ax = fig.add_subplot(1, 2, 1, projection="3d")
        for s in subjects:
            ax.scatter(*np.asarray(s)[::7].T, s=1, alpha=0.3)
        ax.set_title("4 subjects")
        ax.set_axis_off()
        ax = fig.add_subplot(1, 2, 2, projection="3d")
        ax.scatter(*bar[::7].T, s=1, c="tab:purple")
        ax.set_title("Wasserstein barycenter")
        ax.set_axis_off()
        savefig(plt, "track_barycenter.png")

    return float(val)


if __name__ == "__main__":
    main()
