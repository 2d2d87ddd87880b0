"""Free-support Wasserstein barycenters of point clouds
=====================================================

Interpolate between 2D shapes with ``ot.barycenter_sample``: the
barycenter's *support points* are optimized directly via the debiased
barycentric fixed point, so the result is a crisp point cloud rather
than a blurred density.

This solver is a working implementation of an API the reference only
documents as a stub (``ot/_implementations/sample.py:644-652``); the
reference's gallery reaches the same goal by hand-written gradient
descent in ``examples/brain_tractograms/track_barycenter.py``. Run:

    python examples/plot_barycenter_samples.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from geomloss_tpu import ot
from _example_utils import get_pyplot, savefig, size


def ring(n, r=1.0, center=(0.0, 0.0), seed=0):
    rng = np.random.RandomState(seed)
    t = 2 * np.pi * rng.rand(n)
    rad = r * (1 + 0.05 * rng.randn(n))
    pts = np.stack([rad * np.cos(t), rad * np.sin(t)], axis=1)
    return (pts + np.asarray(center)).astype(np.float32)


def square(n, side=2.0, center=(0.0, 0.0), seed=1):
    rng = np.random.RandomState(seed)
    t = rng.rand(n)
    edge = rng.randint(0, 4, n)
    u = side * (t - 0.5)
    h = side / 2
    pts = np.stack(
        [
            np.where(edge < 2, u, np.where(edge == 2, -h, h)),
            np.where(edge >= 2, u, np.where(edge == 0, -h, h)),
        ],
        axis=1,
    )
    return (pts + np.asarray(center)).astype(np.float32)


def main():
    n = size(2000, 128)
    x_ring = jnp.asarray(ring(n, r=1.0, center=(-1.5, 0.0)))
    x_square = jnp.asarray(square(n, side=2.0, center=(1.5, 0.0)))
    clouds = jnp.stack([x_ring, x_square])

    # A family of interpolating barycenters, from the ring to the square:
    ts = [0.0, 0.25, 0.5, 0.75, 1.0]
    bars = []
    for t in ts:
        res = ot.barycenter_sample(
            clouds,
            weights=jnp.asarray([1.0 - t, t]),
            blur=0.05,
            n_iter=size(6, 3),
            diameter=6.0,
        )
        bars.append(np.asarray(res.samples))
        print(
            f"t = {t:.2f}: barycenter of {res.samples.shape[0]:,} points, "
            f"mean = ({float(res.samples[:, 0].mean()):+.3f}, "
            f"{float(res.samples[:, 1].mean()):+.3f})"
        )

    plt = get_pyplot()
    if plt is not None:
        fig, axes = plt.subplots(1, len(ts), figsize=(3 * len(ts), 3))
        for ax, t, z in zip(axes, ts, bars):
            ax.scatter(*np.asarray(x_ring).T, s=1, alpha=0.1, c="tab:blue")
            ax.scatter(*np.asarray(x_square).T, s=1, alpha=0.1, c="tab:red")
            ax.scatter(*z.T, s=2, c="black")
            ax.set_title(f"t = {t:.2f}")
            ax.set_aspect("equal")
            ax.set_axis_off()
        savefig(plt, "barycenter_samples.png")

    # The endpoints recover the inputs (up to the entropic blur):
    return {
        "endpoint_err_ring": float(
            jnp.abs(jnp.asarray(bars[0]) - x_ring).max()
        ),
        "midpoint_mean_x": float(jnp.asarray(bars[2])[:, 0].mean()),
    }


if __name__ == "__main__":
    main()
