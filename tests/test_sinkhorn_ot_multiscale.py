"""Drive the scale-jump branch of the new-generation abstract solver.

``solvers/sinkhorn_ot.py`` ports the multiscale jump of the reference's
``ot/_abstract_solvers/sinkhorn_ot.py:299-412`` (kernel truncation +
coupled dual extrapolation).  Upstream, that branch is unreachable dead
code — no front-end builds a multi-scale ``C_list``, and its second
``extrapolate`` call passes a misspelled ``lob_weights=`` keyword that
would raise ``TypeError`` on any real call (reference ``:385``).  These
tests run OUR port on a genuine two-scale problem — dense cost matrices
at a clustered and a fine resolution, a dense kernel-truncation rule and
a softmin-based dual extrapolation — and pin the result against the
plain single-scale descent on the same schedule.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from geomloss_tpu.ot.solve_matrix import softmin_dense
from geomloss_tpu.solvers.annealing import annealing_parameters
from geomloss_tpu.solvers.sinkhorn_ot import sinkhorn_loop
from geomloss_tpu.utils.typing import CostMatrices

N, M = 96, 80  # distinct sizes so every pair type has a distinct shape
CLUSTER = 8  # points per coarse cluster
BIG = 1.0e5  # "pruned" cost value (finite: keeps logsumexp NaN-free)


def _cloud(n, seed):
    """Genuinely clustered 2D data: CLUSTER-point groups around uniform
    centers, so the coarse scale actually separates from the fine one."""
    rng = np.random.RandomState(seed)
    centers = rng.rand(n // CLUSTER, 2)
    pts = np.repeat(centers, CLUSTER, axis=0) + 0.04 * rng.randn(n, 2)
    return jnp.asarray(pts)


def _weights(n, seed):
    rng = np.random.RandomState(seed)
    w = rng.rand(n) + 0.2
    return jnp.asarray(w / w.sum())


def _pool(w, pts):
    """Pool consecutive points (already cluster-ordered) into blocks."""
    wb = w.reshape(-1, CLUSTER)
    pb = pts.reshape(-1, CLUSTER, 2)
    wc = wb.sum(1)
    cent = (pb * wb[..., None]).sum(1) / wc[:, None]
    labels = jnp.repeat(jnp.arange(wc.shape[0]), CLUSTER)
    return wc, cent, w, pts, labels


def _sqdist(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)[None]  # (1, n, m)


class TwoScaleProblem:
    """Dense two-scale cost structure + the jump callables."""

    def __init__(self, blur=0.15, debias=True):
        aw_c, x_c, a, x, lab_x = _pool(_weights(N, 0), _cloud(N, 1))
        bw_c, y_c, b, y, lab_y = _pool(_weights(M, 2), _cloud(M, 3))
        self.a, self.b = a, b
        self.debias = debias

        def C(u, v):
            return _sqdist(u, v)

        self.C_coarse = CostMatrices(
            xy=C(x_c, y_c), yx=C(y_c, x_c), xx=C(x_c, x_c), yy=C(y_c, y_c)
        )
        self.C_fine = CostMatrices(
            xy=C(x, y), yx=C(y, x), xx=C(x, x), yy=C(y, y)
        )
        self.log_a_list = [
            jnp.log(aw_c)[None], jnp.log(a)[None]
        ]
        self.log_b_list = [
            jnp.log(bw_c)[None], jnp.log(b)[None]
        ]
        # Cluster-diameter scale: jump once eps undercuts the squared
        # cluster size (same rule as the legacy multiscale backend).
        sigma2 = float(
            max(
                ((x - x_c[lab_x]) ** 2).sum(-1).max(),
                ((y - y_c[lab_y]) ** 2).sum(-1).max(),
            )
        ) * 4.0
        self.descent = annealing_parameters(
            maxmin_cost=2.0,
            eps=blur**2,
            scaling=0.7,
            eps_scales=[sigma2, blur**2],
        )
        assert 0 in self.descent.scale_list and 1 in self.descent.scale_list, (
            "schedule must genuinely jump"
        )

        # Mixed fine-rows x coarse-cols matrices for the extrapolation,
        # keyed by the fine matrix's shape (all four differ since N != M):
        self._mixed = {
            self.C_fine.xy.shape: C(x, y_c),
            self.C_fine.yx.shape: C(y, x_c),
            self.C_fine.xx.shape: C(x, x_c),
            self.C_fine.yy.shape: C(y, y_c),
        }
        # Cluster assignment of the fine rows/cols, keyed by coarse shape:
        self._rows = {
            self.C_coarse.xy.shape: (lab_x, lab_y),
            self.C_coarse.yx.shape: (lab_y, lab_x),
            self.C_coarse.xx.shape: (lab_x, lab_x),
            self.C_coarse.yy.shape: (lab_y, lab_y),
        }
        self.pruned_entries = 0

    # --- the two jump callables, reference sinkhorn_ot.py:309-412 ---------
    def kernel_truncation(
        self, *, C, C_fine, f, eps, CT=None, CT_fine=None, g=None, truncate=5.0
    ):
        """Dense kernel-truncation: keep the fine block (i, j) iff its
        coarse pair satisfies ``f_I + g_J - C_IJ >= -truncate * eps``
        (Schmitzer's rule on the scaled dual gap), else set the cost to
        BIG so the softmin ignores it."""
        g_ = f if g is None else g
        keep = (f[:, :, None] + g_[:, None, :] - C) >= -truncate * eps
        lab_r, lab_c = self._rows[C.shape]
        keep_fine = keep[:, lab_r][:, :, lab_c]
        self.pruned_entries += int((~keep_fine).sum())
        C_fine_t = jnp.where(keep_fine, C_fine, BIG)
        CT_fine_t = (
            None
            if CT_fine is None
            else jnp.where(jnp.swapaxes(keep_fine, 1, 2), CT_fine, BIG)
        )
        return C_fine_t, CT_fine_t

    def extrapolate(self, *, self_, other, log_weights, C, C_fine, eps, dampen):
        """Coarse -> fine dual extrapolation (Feydy Eqs. 3.194-3.195):
        evaluate the coarse-dual softmin at the fine positions."""
        mixed = self._mixed[C_fine.shape]
        return dampen(softmin_dense(eps, log_weights, mixed, other))

def _solve(prob, two_scale, truncation=True, tail=60):
    C_list = (
        [prob.C_coarse, prob.C_fine] if two_scale else [prob.C_fine, prob.C_fine]
    )
    descent = (
        prob.descent
        if two_scale
        else prob.descent._replace(
            scale_list=[1] * len(prob.descent.scale_list)
        )
    )
    # Converge both descents at the final temperature so they share one
    # fixed point (the annealed potentials alone differ by the unconverged
    # warm-phase remainder, which is not what the jump branch is about):
    descent = descent._replace(
        eps_list=list(descent.eps_list) + [descent.eps_list[-1]] * tail,
        rho_list=list(descent.rho_list) + [descent.rho_list[-1]] * tail,
        scale_list=list(descent.scale_list) + [descent.scale_list[-1]] * tail,
    )

    def extrapolate(**kw):
        return prob.extrapolate(
            self_=kw.pop("self"), **kw
        )

    return sinkhorn_loop(
        softmin=softmin_dense,
        log_a_list=prob.log_a_list,
        log_b_list=prob.log_b_list,
        C_list=C_list,
        descent=descent,
        kernel_truncation=(prob.kernel_truncation if truncation else None),
        extrapolate=extrapolate,
        debias=prob.debias,
    )


def _ot_value(prob, pots):
    return float(
        (prob.a * pots.f_ba[0]).sum() + (prob.b * pots.g_ab[0]).sum()
    )


@pytest.mark.parametrize("debias", [True, False])
def test_two_scale_matches_single_scale(debias):
    prob = TwoScaleProblem(debias=debias)
    pots_ss = _solve(prob, two_scale=False)
    pots_ms = _solve(prob, two_scale=True, truncation=False)

    v_ss, v_ms = _ot_value(prob, pots_ss), _ot_value(prob, pots_ms)
    # Same fixed point, different warm phase: the symmetric updates
    # contract the leftover mismatch geometrically over the fine tail.
    assert v_ss == pytest.approx(v_ms, rel=1e-3, abs=1e-5)
    if debias:
        np.testing.assert_allclose(
            np.asarray(pots_ms.f_aa), np.asarray(pots_ss.f_aa),
            atol=1e-8,
        )


def test_kernel_truncation_prunes_and_preserves():
    prob = TwoScaleProblem(debias=True)
    pots_full = _solve(prob, two_scale=True, truncation=False)
    pots_trunc = _solve(prob, two_scale=True, truncation=True)

    # The truncation genuinely entered the branch and pruned pairs...
    assert prob.pruned_entries > 0
    # ... without perturbing the result (the pruned scores are below the
    # -truncate * eps dual-gap floor, i.e. negligible Gibbs mass):
    assert _ot_value(prob, pots_trunc) == pytest.approx(
        _ot_value(prob, pots_full), rel=1e-4, abs=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pots_trunc.f_ba), np.asarray(pots_full.f_ba), atol=1e-4
    )


def test_truncation_signature_matches_reference_contract():
    """The loop must call kernel_truncation with keyword arguments
    (C, CT, C_fine, CT_fine, f, g, eps) on the cross pair and
    (C, C_fine, f, eps) on the symmetric pairs — reference
    ``sinkhorn_ot.py:326-351``."""
    calls = []
    prob = TwoScaleProblem(debias=True)

    kt = prob.kernel_truncation

    def spy(**kw):
        calls.append(sorted(k for k, v in kw.items() if v is not None))
        return kt(**kw)

    prob.kernel_truncation = spy
    _solve(prob, two_scale=True, truncation=True)
    assert ["C", "CT", "CT_fine", "C_fine", "eps", "f", "g"] in [
        sorted(c) for c in calls
    ]
    assert ["C", "C_fine", "eps", "f"] in [sorted(c) for c in calls]
