"""Wasserstein barycenters of 1D densities
=========================================

Interpolate between two 1D histograms with ``ImagesBarycenter`` (the
grid-Sinkhorn barycenter solver): sweeping the weight from 0 to 1 traces
the displacement interpolation, while a plain mixture just fades.

TPU-native counterpart of the reference's
``examples/optimal_transport/plot_wasserstein_barycenters_1D.py``. Run:

    python examples/plot_wasserstein_barycenters_1D.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from geomloss_tpu import ImagesBarycenter
from _example_utils import get_pyplot, savefig, size


def gaussian_hist(n, mean, std):
    t = np.linspace(0, 1, n)
    w = np.exp(-0.5 * ((t - mean) / std) ** 2)
    return (w / w.sum()).astype(np.float32)


def main():
    n = size(512, 128)
    A = gaussian_hist(n, 0.25, 0.04)
    B = gaussian_hist(n, 0.7, 0.09)
    measures = jnp.asarray(np.stack([A, B])[None])  # (1, K=2, N)

    bars = []
    ts = np.linspace(0, 1, size(7, 3))
    scaling_N = size(200, 40)  # descent steps per scale
    for t in ts:
        w = jnp.asarray([[1 - t, t]], jnp.float32)
        bar = ImagesBarycenter(measures, w, blur=0.01, scaling_N=scaling_N)
        bars.append(np.asarray(bar)[0, 0])
        mean = float((np.arange(n) / n * bars[-1]).sum() / bars[-1].sum())
        print(f"t={t:.2f}: barycenter mass={bars[-1].sum():.4f} mean={mean:.3f}")

    plt = get_pyplot()
    if plt is not None:
        t_axis = np.linspace(0, 1, n)
        fig, ax = plt.subplots(figsize=(8, 5))
        for t, bar in zip(ts, bars):
            ax.plot(t_axis, bar, color=plt.cm.viridis(t), label=f"t={t:.2f}")
        ax.plot(t_axis, A, "k--", lw=1)
        ax.plot(t_axis, B, "k--", lw=1)
        ax.set_title("Wasserstein barycenters: displacement interpolation")
        ax.legend(fontsize=7)
        savefig(plt, "wasserstein_barycenters_1D.png")

    # The mean should interpolate linearly along the flow:
    return bars[len(bars) // 2].sum()


if __name__ == "__main__":
    main()
