"""Color transfer with Optimal Transport
=======================================

Treat the RGB values of two images as 3D point clouds and transport one
palette onto the other with the barycentric map of an entropic OT plan.

TPU-native counterpart of the reference's
``examples/optimal_transport/plot_optimal_transport_color.py`` (which
loads photographs; we synthesize two differently-lit procedural images).
Run:

    python examples/plot_optimal_transport_color.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from geomloss_tpu import ot
from _example_utils import get_pyplot, savefig, size


def make_image(seed, tint, side):
    """A procedural 'photograph': smooth noise + a color tint."""
    rng = np.random.RandomState(seed)
    g = rng.randn(8, 8, 3)
    # Upsample smoothly to side x side:
    img = np.asarray(
        jnp.clip(
            jnp.asarray(
                np.kron(g, np.ones((side // 8, side // 8, 1)))
            ) * 0.15 + jnp.asarray(tint),
            0.0, 1.0,
        )
    )
    return img.astype(np.float32)


def main():
    side = 8 * max(2, size(64, 16) // 8)
    src = make_image(0, [0.7, 0.45, 0.3], side)  # warm
    tgt = make_image(1, [0.35, 0.5, 0.75], side)  # cool

    X = src.reshape(-1, 3)
    Y = tgt.reshape(-1, 3)

    res = ot.solve_sample(X_a=X, X_b=Y, reg=2 * 0.05**2, max_iter=100)
    X_new = np.asarray(res.a_to_b)  # each source color -> its image
    out = X_new.reshape(side, side, 3).clip(0, 1)

    print(f"palettes: src mean {X.mean(0).round(3)}, tgt mean {Y.mean(0).round(3)}")
    print(f"transferred mean   {X_new.mean(0).round(3)} (should match tgt)")

    plt = get_pyplot()
    if plt is not None:
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        for ax, img, title in zip(
            axes, [src, tgt, out], ["source", "target palette", "transferred"]
        ):
            ax.imshow(img)
            ax.set_title(title)
            ax.axis("off")
        savefig(plt, "optimal_transport_color.png")

    return float(np.abs(X_new.mean(0) - Y.mean(0)).max())


if __name__ == "__main__":
    main()
