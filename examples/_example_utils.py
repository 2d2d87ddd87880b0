"""Shared helpers for the examples gallery.

The reference gallery loads PNG densities and triangle meshes from data
files; these helpers synthesize equivalent point clouds procedurally so
every script is self-contained. Plotting is optional: scripts save PNGs
next to themselves when matplotlib is importable and skip rendering
otherwise (e.g. in the smoke-test environment).

Set ``GEOMLOSS_TPU_SMOKE=1`` to shrink problem sizes for fast CI runs.
"""

import os

import numpy as np

SMOKE = os.environ.get("GEOMLOSS_TPU_SMOKE", "") == "1"


def size(full, smoke=None):
    """Problem size: `full` normally, `smoke` (default full // 10) in CI."""
    return (smoke if smoke is not None else max(16, full // 10)) if SMOKE else full


def get_pyplot():
    """Matplotlib's pyplot with a headless backend, or None."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def savefig(plt, name):
    if plt is None:
        return
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, name)
    plt.savefig(path, dpi=110, bbox_inches="tight")
    print(f"saved {path}")


# ------------------------------------------------------------------ samplers


def gaussian_mixture(n, centers, stds, weights=None, seed=0, d=2):
    """Sample ``n`` points from a Gaussian mixture (unit-square-ish)."""
    rng = np.random.RandomState(seed)
    centers = np.asarray(centers, np.float64)
    stds = np.broadcast_to(np.asarray(stds, np.float64), (len(centers),))
    if weights is None:
        weights = np.full(len(centers), 1.0 / len(centers))
    ks = rng.choice(len(centers), size=n, p=weights)
    return (centers[ks] + stds[ks, None] * rng.randn(n, d)).astype(np.float32), ks


def disk(n, center=(0.5, 0.5), radius=0.3, seed=0):
    rng = np.random.RandomState(seed)
    r = radius * np.sqrt(rng.rand(n))
    t = 2 * np.pi * rng.rand(n)
    return (
        np.stack([r * np.cos(t), r * np.sin(t)], axis=1) + np.asarray(center)
    ).astype(np.float32)


def annulus(n, center=(0.5, 0.5), r0=0.25, r1=0.4, seed=0):
    rng = np.random.RandomState(seed)
    r = np.sqrt(rng.rand(n) * (r1**2 - r0**2) + r0**2)
    t = 2 * np.pi * rng.rand(n)
    return (
        np.stack([r * np.cos(t), r * np.sin(t)], axis=1) + np.asarray(center)
    ).astype(np.float32)


def crescent(n, seed=0):
    rng = np.random.RandomState(seed)
    t = np.pi * rng.rand(n)
    r = 0.3 + 0.05 * rng.randn(n)
    pts = np.stack([0.5 + r * np.cos(t), 0.35 + r * np.sin(t)], axis=1)
    return pts.astype(np.float32)


def sphere_3d(n, seed=0, radius=0.4, center=(0.5, 0.5, 0.5)):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (np.asarray(center) + radius * v).astype(np.float32)


def torus_3d(n, seed=0, R=0.35, r=0.12, center=(0.5, 0.5, 0.5)):
    rng = np.random.RandomState(seed)
    u = 2 * np.pi * rng.rand(n)
    v = 2 * np.pi * rng.rand(n)
    x = (R + r * np.cos(v)) * np.cos(u)
    y = (R + r * np.cos(v)) * np.sin(u)
    z = r * np.sin(v)
    return (np.asarray(center) + np.stack([x, y, z], axis=1)).astype(np.float32)


def fibers_3d(n_fibers, n_points, seed=0, bundle=0):
    """Synthetic brain-fiber-like 3D streamlines: arcs from one region to
    another with smooth noise. Returns (n_fibers * n_points, 3) points and
    per-point fiber ids."""
    rng = np.random.RandomState(seed + 17 * bundle)
    t = np.linspace(0, 1, n_points)
    start = np.array([0.2, 0.3 + 0.2 * bundle, 0.3])
    end = np.array([0.8, 0.4 + 0.15 * bundle, 0.6])
    apex_h = 0.3 + 0.1 * bundle
    pts = []
    ids = []
    for k in range(n_fibers):
        jitter = 0.03 * rng.randn(3)
        arc = (
            (1 - t)[:, None] * (start + jitter)
            + t[:, None] * (end + jitter)
            + np.outer(np.sin(np.pi * t), np.array([0.0, 0.0, apex_h]))
        )
        arc += 0.005 * rng.randn(n_points, 3)
        pts.append(arc)
        ids.append(np.full(n_points, k))
    return (
        np.concatenate(pts).astype(np.float32),
        np.concatenate(ids).astype(np.int32),
    )
