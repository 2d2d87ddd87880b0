"""Drive the scale-jump branch of the abstract barycenter solver.

``solvers/barycenters.py::sinkhorn_barycenter_loop`` ports the multiscale
jump of the reference's ``ot/_abstract_solvers/sinkhorn_barycenters.py``
(``:253-298``).  Upstream that branch is unreachable dead code — no
front-end ever builds a multi-scale ``C_list``, and its post-jump line
``eps = descent.eps_list[scale]`` indexes the temperature list by a
*scale index* (reference ``:298``), which would corrupt the schedule on
any real call.  These tests run OUR port on a genuine two-scale 1D grid
problem with dense cost matrices and pin the result against the
single-scale descent.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from geomloss_tpu.ot.solve_matrix import _barycenter_C, _softmin_bk
from geomloss_tpu.solvers.annealing import annealing_parameters
from geomloss_tpu.solvers.barycenters import sinkhorn_barycenter_loop

MF = 32  # fine grid size
R = 4  # pooling factor (coarse grid size MF // R)
BLUR = 0.05


def _grid(m):
    if m == MF:
        return jnp.linspace(0.0, 1.0, m)
    # Coarse grid = centroids of the pooled fine cells (NOT a fresh
    # linspace: the coarse problem must see the same geometry the fine
    # masses were pooled on, or the warm phase converges to a laterally
    # shifted barycenter that the metastable fine iterations never heal).
    return jnp.linspace(0.0, 1.0, MF).reshape(m, MF // m).mean(-1)


def _bump(m, center, width=0.08):
    x = np.linspace(0.0, 1.0, m)
    d = np.exp(-((x - center) ** 2) / (2 * width**2)) + 1e-6
    return jnp.asarray(d / d.sum())


def _cost_stack(m):
    x = _grid(m)
    C = (x[:, None] - x[None, :]) ** 2  # (m, m)
    cost = jnp.broadcast_to(C, (1, 2, m, m))  # (B=1, K=2, N, M)
    return _barycenter_C(cost, jnp.swapaxes(cost, 2, 3), C[None])


def _problem():
    b_fine = jnp.stack([_bump(MF, 0.25), _bump(MF, 0.75)])[None]  # (1, 2, MF)
    b_coarse = b_fine.reshape(1, 2, MF // R, R).sum(-1)
    log_b_list = [jnp.log(b_coarse), jnp.log(b_fine)]
    C_list = [_cost_stack(MF // R), _cost_stack(MF)]
    w_k = jnp.full((1, 2), 0.5)
    # Jump once eps undercuts the squared coarse cell size:
    sigma2 = float(R / MF) ** 2
    descent = annealing_parameters(
        maxmin_cost=1.0,
        eps=BLUR**2,
        scaling=0.7,
        eps_scales=[sigma2, BLUR**2],
    )
    assert 0 in descent.scale_list and 1 in descent.scale_list
    return log_b_list, C_list, w_k, descent


def _extrapolate(*, self, other, log_weights, C, C_fine, eps, dampen):
    """Coarse -> fine on a regular 1D grid: nearest-neighbour upsample.
    Dual potentials copy their value into each sub-cell; the debiasing
    log-density (recognizable by its singleton K-axis) also splits its
    mass uniformly (``- log R``)."""
    up = jnp.repeat(self, R, axis=-1)
    if self.shape[1] == 1:  # log_d: a log-density, not a potential
        up = up - jnp.log(float(R))
    return up


def _solve(two_scale, tail=150, backward_iterations=5):
    log_b_list, C_list, w_k, descent = _problem()
    if not two_scale:
        descent = descent._replace(scale_list=[1] * len(descent.scale_list))
    # Converge both descents at the final temperature (the jump branch is
    # about the warm phase, not about unconverged-descent differences):
    descent = descent._replace(
        eps_list=list(descent.eps_list) + [descent.eps_list[-1]] * tail,
        rho_list=list(descent.rho_list) + [None] * tail,
        scale_list=list(descent.scale_list) + [descent.scale_list[-1]] * tail,
    )
    return sinkhorn_barycenter_loop(
        softmin=_softmin_bk,
        log_b_k_list=log_b_list,
        w_k=w_k,
        C_list=C_list,
        descent=descent,
        extrapolate=_extrapolate,
        backward_iterations=backward_iterations,
    )


def test_two_scale_matches_single_scale():
    bar_ss = np.asarray(_solve(two_scale=False))[0, 0]
    bar_ms = np.asarray(_solve(two_scale=True))[0, 0]
    assert bar_ms.shape == (MF,)
    # Both descents approach the same fixed point. The approach is slow —
    # the debiased-barycenter iteration has a near-neutral mode (no
    # convergence proof exists for it; measured contraction here is
    # ~0.995/iter) — but the gap shrinks monotonically (3.6e-3 at
    # tail=80, 2.5e-3 at 150, 1.2e-3 at 300), whereas a genuinely wrong
    # jump (e.g. a laterally-shifted coarse geometry) parks ~1.3e-2 away
    # and never heals:
    np.testing.assert_allclose(bar_ms, bar_ss, atol=3e-3)
    # Sanity: the debiased barycenter of two symmetric bumps is a bump
    # centered midway.
    x = np.linspace(0.0, 1.0, MF)
    mean = float((bar_ms * x).sum() / bar_ms.sum())
    assert mean == pytest.approx(0.5, abs=0.02)
    assert float(bar_ms.sum()) == pytest.approx(1.0, abs=5e-2)
