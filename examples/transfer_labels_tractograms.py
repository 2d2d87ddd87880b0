"""Transferring labels between brain tractograms
==============================================

Fiber tracts are huge 3D point clouds (millions of points grouped into
streamlines). We segment an unlabeled tractogram by (1) solving a
large-scale OT problem with the multiscale backend, (2) transferring
bundle labels through the implicit plan, and (3) voting per fiber.

TPU-native counterpart of the reference's
``examples/brain_tractograms/transfer_labels.py`` (which loads real
tractograms; we synthesize arc-shaped fiber bundles). Run:

    python examples/transfer_labels_tractograms.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from geomloss_tpu import SamplesLoss
from geomloss_tpu.ops.softmin import gibbs_apply
from _example_utils import fibers_3d, get_pyplot, savefig, size


N_BUNDLES = 3


def tractogram(seed, n_fibers, n_points=20):
    pts, fiber_ids, bundles = [], [], []
    for b in range(N_BUNDLES):
        p, ids = fibers_3d(n_fibers, n_points, seed=seed, bundle=b)
        pts.append(p)
        fiber_ids.append(ids + b * n_fibers)
        bundles.append(np.full(len(p), b, np.int32))
    return (
        np.concatenate(pts),
        np.concatenate(fiber_ids),
        np.concatenate(bundles),
    )


def main():
    n_fibers = size(600, 40)
    # Labeled atlas and unlabeled subject (different seeds = anatomy):
    y, _, bundle_y = tractogram(0, n_fibers)
    x, fiber_x, bundle_x_true = tractogram(1, n_fibers)
    print(f"subject: {len(x):,} points, atlas: {len(y):,} points")

    xj, yj = jnp.asarray(x), jnp.asarray(y)
    blur = 0.02
    solver = SamplesLoss(
        "sinkhorn", p=2, blur=blur, scaling=0.8, diameter=2.0,
        debias=False, potentials=True,
    )
    F_i, G_j = solver(xj, yj)
    F_i, G_j = F_i.reshape(-1), G_j.reshape(-1)  # drop the dummy batch axis

    # Label transfer through the implicit plan (streaming — the plan of
    # up to 10^9+ entries is never materialized):
    eps = blur**2
    onehot = jnp.asarray(np.eye(N_BUNDLES, dtype=np.float32)[bundle_y]) / len(y)
    votes = np.asarray(
        gibbs_apply(xj, yj, F_i / eps, G_j / eps, onehot, eps, p=2)
    )
    point_labels = votes.argmax(-1)

    # Majority vote per fiber:
    fiber_labels = np.zeros(fiber_x.max() + 1, np.int32)
    for f in range(fiber_x.max() + 1):
        sel = fiber_x == f
        fiber_labels[f] = np.bincount(
            point_labels[sel], minlength=N_BUNDLES
        ).argmax()
    acc_points = (point_labels == bundle_x_true).mean()
    acc_fibers = (fiber_labels[fiber_x] == bundle_x_true).mean()
    print(f"pointwise accuracy : {acc_points:.3f}")
    print(f"fiber-vote accuracy: {acc_fibers:.3f}")

    plt = get_pyplot()
    if plt is not None:
        colors = np.array([[0.85, 0.3, 0.3], [0.3, 0.6, 0.85], [0.4, 0.75, 0.4]])
        fig = plt.figure(figsize=(11, 5))
        for k, (pts, lab, title) in enumerate(
            [(y, bundle_y, "Labeled atlas"),
             (x, fiber_labels[fiber_x], "Subject, transferred labels")]
        ):
            ax = fig.add_subplot(1, 2, k + 1, projection="3d")
            ax.scatter(*pts[::5].T, s=1, c=colors[lab[::5]])
            ax.set_title(title)
            ax.set_axis_off()
        savefig(plt, "tractogram_labels.png")

    return acc_fibers


if __name__ == "__main__":
    main()
