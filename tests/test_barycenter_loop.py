"""Tests for the new-API abstract barycenter loop
(solvers/barycenters.py), wired with the separable grid softmin."""

import numpy as np

import jax
import jax.numpy as jnp

from geomloss_tpu.ops.grid import log_dens, softmin_grid
from geomloss_tpu.solvers.barycenters import sinkhorn_barycenter_loop
from geomloss_tpu.utils.typing import CostMatrices, DescentParameters


def _gaussian_image(N, cx, cy, s):
    x = np.arange(N) / N
    g = np.exp(-((x[:, None] - cx) ** 2 + (x[None, :] - cy) ** 2) / (2 * s**2))
    return g / g.sum()


def _grid_softmin(eps, C, h):
    return softmin_grid(eps, C, h, D=2)


def test_barycenter_loop_single_scale_identity():
    N = 16
    img = _gaussian_image(N, 0.5, 0.5, 0.12)
    log_b_k = log_dens(jnp.asarray(np.stack([img, img])[None]))  # (1,2,N,N)
    w_k = jnp.asarray([[0.5, 0.5]])

    p = 2
    eps_list = list(np.maximum(np.geomspace(1.0, (1 / N) ** p, 40), (1 / N) ** p))
    descent = DescentParameters(
        scale_list=[0] * len(eps_list),
        eps_list=[float(e) for e in eps_list],
        rho_list=[None] * len(eps_list),
    )
    C = CostMatrices(xy=p, yx=p, xx=p, yy=p)

    bar = sinkhorn_barycenter_loop(
        softmin=_grid_softmin,
        log_b_k_list=[log_b_k],
        w_k=w_k,
        C_list=[C],
        descent=descent,
        backward_iterations=3,
    )
    assert bar.shape == (1, 1, N, N)
    bar_np = np.asarray(bar[0, 0])
    np.testing.assert_allclose(bar_np.sum(), 1.0, rtol=5e-2)
    assert np.abs(bar_np - img).max() < 0.1 * img.max()


def test_barycenter_loop_gradients():
    N = 8
    a = _gaussian_image(N, 0.3, 0.5, 0.15)
    b = _gaussian_image(N, 0.7, 0.5, 0.15)
    measures = jnp.asarray(np.stack([a, b])[None])

    eps_list = [1.0, 0.25, 0.0625, 0.0156, 0.0156]
    descent = DescentParameters(
        scale_list=[0] * len(eps_list),
        eps_list=eps_list,
        rho_list=[None] * len(eps_list),
    )
    C = CostMatrices(xy=2, yx=2, xx=2, yy=2)

    def center_of_mass_x(w):
        bar = sinkhorn_barycenter_loop(
            softmin=_grid_softmin,
            log_b_k_list=[log_dens(measures)],
            w_k=w,
            C_list=[C],
            descent=descent,
            backward_iterations=2,
        )[0, 0]
        xs = jnp.arange(N) / N
        return (xs * bar.sum(1)).sum() / bar.sum()

    w = jnp.asarray([[0.5, 0.5]])
    g = jax.grad(center_of_mass_x)(w)
    g_np = np.asarray(g[0])
    assert np.all(np.isfinite(g_np))
    # Increasing the weight of the right-hand measure moves the barycenter right:
    assert g_np[1] > g_np[0]
