"""Warm-precision (plain-bf16 MXU) path: noise bounds and solver accuracy.

The online backend runs its warm annealing iterations with ``exact=False``
(plain-bf16 MXU scores, ~6x less matrix work than the f32-exact
split-operand expansion — see ``ops/pallas_kernels.py``). Off-TPU the
interpreter computes f32 dots exactly, so the kernels emulate the MXU's
bf16 operand rounding explicitly — these tests therefore exercise the
*actual* approximation production TPU solves use, not a no-op.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geomloss_tpu.models import sinkhorn_samples as ss
from geomloss_tpu.ops.pallas_kernels import (
    sinkhorn_step_pallas,
    sinkhorn_step_sym_pallas,
)


def _cloud(n, d, seed, scale=1.0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x * scale
    # Center (the production path centers on the joint mean):
    return jnp.asarray(x - x.mean(0, keepdims=True))


@pytest.mark.parametrize("eps", [1.0, 0.25])
def test_warm_step_noise_bound(eps):
    """exact=False perturbs the raw softmin by at most the documented
    score-noise bound (~2^-8 (diam/2)^2 on centered clouds) — and by a
    nonzero amount, proving the bf16 path is actually exercised."""
    n = 256
    x = _cloud(n, 3, 0)
    y = _cloud(n, 3, 1)
    la = jnp.full((n,), -np.log(n), jnp.float32)
    f = jnp.zeros((n,), jnp.float32)

    S_ex, T_ex = sinkhorn_step_pallas(x, y, f, f, la, la, eps, p=2, exact=True)
    S_wm, T_wm = sinkhorn_step_pallas(x, y, f, f, la, la, eps, p=2, exact=False)

    # Documented per-score noise (models/sinkhorn_samples.py): the LSE
    # output moves by at most the max score perturbation, which is
    # eps-free in the potential. radius = 1 here; truncation emulation
    # doubles round-to-nearest, D=3 terms accumulate: allow 8x headroom.
    bound = 8 * 2.0**-8 * 1.0**2
    err = max(
        float(jnp.abs(S_ex - S_wm).max()), float(jnp.abs(T_ex - T_wm).max())
    )
    assert err <= bound, f"warm-step noise {err} above bound {bound}"
    assert err > 0.0, "exact=False produced identical results: path not exercised"


def test_warm_step_sym_noise_bound():
    n = 256
    x = _cloud(n, 3, 2)
    la = jnp.full((n,), -np.log(n), jnp.float32)
    f = jnp.zeros((n,), jnp.float32)
    eps = 1.0

    S_ex = sinkhorn_step_sym_pallas(x, f, la, eps, p=2, exact=True)
    S_wm = sinkhorn_step_sym_pallas(x, f, la, eps, p=2, exact=False)

    bound = 8 * 2.0**-8
    err = float(jnp.abs(S_ex - S_wm).max())
    assert err <= bound
    assert err > 0.0


def _online_loss(x, y, monkeypatch, *, noise_factor, exact_tail, n):
    a = jnp.ones((1, n), jnp.float32) / n
    # The warm-bf16 schedule is opt-in since round 5 (measured dead on
    # v5e); these tests exercise the opt-in path.
    monkeypatch.setattr(ss, "WARM_BF16", True)
    monkeypatch.setattr(ss, "WARM_NOISE_FACTOR", noise_factor)
    monkeypatch.setattr(ss, "WARM_EXACT_TAIL", exact_tail)
    out = ss.sinkhorn_online(
        a, x[None], a, y[None], p=2, blur=0.05, diameter=2.0, scaling=0.5,
        impl="pallas",
    )
    return float(out[0])


def test_warm_prefix_full_solve_accuracy(monkeypatch):
    """A warm prefix + exact tail reproduces the fully-exact online solve
    to well under the f32 solver noise, even with an aggressive schedule
    (tail=2) — the closing exact averaged updates contract the bf16
    handoff error geometrically."""
    n = 512
    x = _cloud(n, 3, 3)
    y = _cloud(n, 3, 4)

    exact = _online_loss(x, y, monkeypatch, noise_factor=1e30, exact_tail=6, n=n)
    # Default production constants (warm_iters = 2 at this schedule):
    warm_def = _online_loss(x, y, monkeypatch, noise_factor=100.0, exact_tail=6, n=n)
    # One more warm iteration (warm_iters = 3):
    warm_mid = _online_loss(x, y, monkeypatch, noise_factor=100.0, exact_tail=3, n=n)
    # Aggressive: every eligible iteration warm, only 2 exact closers:
    warm_agg = _online_loss(x, y, monkeypatch, noise_factor=1.0, exact_tail=2, n=n)

    # Measured landscape (bf16-truncation emulation, conservative vs the
    # MXU's round-to-nearest): the error is dominated by the *last* warm
    # iteration's noise/eps ratio and grows ~4x per extra warm step:
    # warm_iters 2 -> ~4e-5 rel, 3 -> ~3e-4, 6 -> ~3e-3.
    scale = max(abs(exact), 1e-3)
    assert abs(warm_def - exact) <= 1e-4 * scale
    assert abs(warm_mid - exact) <= 1e-3 * scale
    assert abs(warm_agg - exact) <= 1e-2 * scale


def test_warm_iters_selected_at_bench_config(monkeypatch):
    """The (opt-in) heuristic actually schedules warm iterations at the
    benchmark configuration (and respects the exact tail)."""
    seen = {}
    real_loop = ss.sinkhorn_loop

    def spy_loop(*args, **kwargs):
        seen["warm_iters"] = kwargs.get("warm_iters", 0)
        seen["n_eps"] = len(args[7])
        return real_loop(*args, **kwargs)

    monkeypatch.setattr(ss, "WARM_BF16", True)
    monkeypatch.setattr(ss, "sinkhorn_loop", spy_loop)
    n = 128
    x = _cloud(n, 3, 5)
    a = jnp.ones((1, n), jnp.float32) / n
    ss.sinkhorn_online(
        a, x[None], a, x[None] + 0.1, p=2, blur=0.05, diameter=2.0,
        scaling=0.5, impl="pallas",
    )
    assert seen["warm_iters"] > 0
    assert seen["warm_iters"] <= seen["n_eps"] - ss.WARM_EXACT_TAIL


def test_warm_bf16_off_by_default(monkeypatch):
    """Production default carries no bf16 approximation: warm_iters = 0
    unless WARM_BF16 is opted into (round-4 measurement: exact and warm
    sweeps run at the same speed on v5e, PROFILE_PHASES dense_pair_step)."""
    seen = {}
    real_loop = ss.sinkhorn_loop

    def spy_loop(*args, **kwargs):
        seen["warm_iters"] = kwargs.get("warm_iters", 0)
        return real_loop(*args, **kwargs)

    monkeypatch.setattr(ss, "sinkhorn_loop", spy_loop)
    n = 128
    x = _cloud(n, 3, 6)
    a = jnp.ones((1, n), jnp.float32) / n
    ss.sinkhorn_online(
        a, x[None], a, x[None] + 0.1, p=2, blur=0.05, diameter=2.0,
        scaling=0.5, impl="pallas",
    )
    assert seen["warm_iters"] == 0
