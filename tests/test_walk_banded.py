"""Banded dual-direction walk: one pass, both softmin directions.

Validates ``walk_plan_banded`` + ``sinkhorn_step_walk_banded`` against the
two-pass ``sinkhorn_step_walk`` (row traversal of ``tbl`` + transposed
traversal of ``tblT``) on identical kept-pair sets, in Pallas interpreter
mode. The banded traversal reorders the column-direction summation
(band-major instead of column-major), so comparisons use f32-reassociation
tolerances rather than bit equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import geomloss_tpu.ops.block_sparse as bs


def _random_problem(key, n_tiles, m_tiles, block, D=3):
    kx, ky, kf, kg = jax.random.split(key, 4)
    N, M = n_tiles * block, m_tiles * block
    x = jax.random.normal(kx, (N, D), jnp.float32)
    y = jax.random.normal(ky, (M, D), jnp.float32) + 0.5
    f = 0.1 * jax.random.normal(kf, (N,), jnp.float32)
    g = 0.1 * jax.random.normal(kg, (M,), jnp.float32)
    a_log = jnp.full((N,), -np.log(N), jnp.float32)
    b_log = jnp.full((M,), -np.log(M), jnp.float32)
    return x, y, f, g, a_log, b_log


def _full_mask(key, n_tiles, m_tiles, cap, frac=0.6):
    """Random kept-tile mask with a consistent (unclipped) transpose."""
    dense = jax.random.uniform(key, (n_tiles, m_tiles)) < frac
    # Every row/col keeps at least its diagonal-ish tile:
    eye = jnp.eye(n_tiles, m_tiles, dtype=bool)
    dense = dense | eye | eye[::-1]
    score = jnp.where(dense, 1.0, -jnp.inf)
    cols, counts, _ = bs._cols_from_score(score, cap)
    # The transposed table must hold the SAME pair set (column counts are
    # not bounded by the row cap):
    colsT, countsT, _ = bs._cols_from_score(score.T, n_tiles)
    assert int(counts.max()) <= cap
    return cols, counts, colsT, countsT


@pytest.mark.parametrize("p", [2, 1])
def test_banded_matches_two_pass(p):
    key = jax.random.PRNGKey(0)
    n_tiles, m_tiles, block, cap = 6, 8, 128, 8
    x, y, f, g, a_log, b_log = _random_problem(key, n_tiles, m_tiles, block)
    cols, counts, colsT, countsT = _full_mask(
        jax.random.PRNGKey(1), n_tiles, m_tiles, cap
    )
    eps = 0.3

    tbl = bs.walk_plan(cols, counts, cap)
    tblT = bs.walk_plan(colsT, countsT, int(countsT.max()))
    S_ref, T_ref = bs.sinkhorn_step_walk(
        eps, x, y, a_log, b_log, f, g, tbl, tblT, p=p, block=block
    )

    tblB = bs.walk_plan_banded(cols, counts, cap, m_tiles, band_tiles=4)
    S_b, T_b = bs.sinkhorn_step_walk_banded(
        eps, x, y, a_log, b_log, f, g, tblB, p=p, block=block,
        band_tiles=4,
    )
    np.testing.assert_allclose(S_b, S_ref, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(T_b, T_ref, rtol=2e-6, atol=2e-6)


def test_banded_multi_chunk_and_single_band(monkeypatch):
    """Chunked launches (nI > MAX_BANDED_ROWS) and nJ < band_tiles."""
    monkeypatch.setattr(bs, "MAX_BANDED_ROWS", 8)
    key = jax.random.PRNGKey(2)
    n_tiles, m_tiles, block, cap = 10, 3, 128, 3
    x, y, f, g, a_log, b_log = _random_problem(key, n_tiles, m_tiles, block)
    cols, counts, colsT, countsT = _full_mask(
        jax.random.PRNGKey(3), n_tiles, m_tiles, cap, frac=0.5
    )
    eps = 0.5

    tbl = bs.walk_plan(cols, counts, cap)
    tblT = bs.walk_plan(colsT, countsT, int(countsT.max()))
    S_ref, T_ref = bs.sinkhorn_step_walk(
        eps, x, y, a_log, b_log, f, g, tbl, tblT, p=2, block=block
    )
    tblB = bs.walk_plan_banded(cols, counts, cap, m_tiles, band_tiles=4)
    assert tblB.shape[0] == 2  # 10 rows in chunks of 8
    S_b, T_b = bs.sinkhorn_step_walk_banded(
        eps, x, y, a_log, b_log, f, g, tblB, p=2, block=block,
        band_tiles=4,
    )
    np.testing.assert_allclose(S_b, S_ref, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(T_b, T_ref, rtol=2e-6, atol=2e-6)


def test_banded_plan_clipping_structure():
    """Over-budget chunks clip proportionally, keeping best-score prefixes."""
    n_tiles, m_tiles, cap, t_mean = 4, 16, 12, 4
    rng = np.random.default_rng(0)
    cols = jnp.asarray(
        np.sort(rng.permuted(np.tile(np.arange(m_tiles), (n_tiles, 1)),
                             axis=1)[:, :cap], axis=1),
        jnp.int32,
    )
    counts = jnp.asarray([12, 12, 2, 12], jnp.int32)
    tblB = bs.walk_plan_banded(cols, counts, t_mean, m_tiles, band_tiles=4)
    words = np.asarray(tblB[0])
    fl = words >> 26
    live = words[(fl == 0) | (fl == 3)]  # fl 3 = last live step of a band
    rows = (live >> 13) & 0x1FFF
    # Budget respected: at most rows_c * t_mean live steps (rows are
    # padded to a multiple of 8 for the kernel's aligned row groups)
    assert live.size <= 8 * t_mean
    # Proportional: the small row keeps at least one entry
    assert (rows == 2).sum() >= 1
    # Band-major: band indices non-decreasing over the packed table
    bands = (words & 0x1FFF) // 4
    assert (np.diff(bands) >= 0).all()
    # One marker per band, leading its section
    markers = np.where(fl == 1)[0]
    assert len(markers) == 4


@pytest.mark.parametrize("p", [2, 1])
def test_banded_extrapolation_grad_matches_two_pass(p, monkeypatch):
    # Small apply bands so the dual gradient contraction crosses band
    # boundaries even at test sizes:
    monkeypatch.setattr(bs, "APPLY_BAND_TILES", 2)
    key = jax.random.PRNGKey(4)
    n_tiles, m_tiles, block, cap = 4, 4, 128, 4
    x, y, f, g, a_log, b_log = _random_problem(key, n_tiles, m_tiles, block)
    cols, counts, colsT, countsT = _full_mask(
        jax.random.PRNGKey(5), n_tiles, m_tiles, cap
    )
    eps = 0.25
    tbl = bs.walk_plan(cols, counts, cap)
    tblT = bs.walk_plan(colsT, countsT, int(countsT.max()))
    tblB = bs.walk_plan_banded(cols, counts, cap, m_tiles, band_tiles=4)
    tblA = bs.walk_plan_banded(cols, counts, cap, m_tiles, band_tiles=2)
    a = jnp.full((x.shape[0],), 1.0 / x.shape[0])
    b = jnp.full((y.shape[0],), 1.0 / y.shape[0])

    def loss_ref(xx, yy):
        S, T = bs.softmin_extrapolation_walk(
            xx, yy, f, g, a_log, b_log, eps, tbl, tblT, p, block
        )
        return (a * S).sum() + (b * T).sum()

    def loss_banded(xx, yy):
        S, T = bs.softmin_extrapolation_walk_banded(
            xx, yy, f, g, a_log, b_log, eps, tblB, tblA, p, block,
            band_tiles=4, apply_band_tiles=2,
        )
        return (a * S).sum() + (b * T).sum()

    v_ref, gr_ref = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, y)
    v_b, gr_b = jax.value_and_grad(loss_banded, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(v_b, v_ref, rtol=2e-6, atol=2e-6)
    for gb, gr in zip(gr_b, gr_ref):
        np.testing.assert_allclose(gb, gr, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("p", [2, 1])
def test_triangle_sym_matches_full_walk(p, monkeypatch):
    """tri=True tables: upper-triangle visits + mirrored column sums
    reproduce the full symmetric walk at half the pair count."""
    monkeypatch.setattr(bs, "APPLY_BAND_TILES", 2)
    key = jax.random.PRNGKey(6)
    n_tiles, block, cap = 6, 128, 6
    x, _, f, _, a_log, _ = _random_problem(key, n_tiles, n_tiles, block)
    # Symmetric pattern with a roomy cap (top-k never clips):
    dense = jax.random.uniform(jax.random.PRNGKey(7), (n_tiles, n_tiles)) < 0.5
    dense = dense | dense.T | jnp.eye(n_tiles, dtype=bool)
    score = jnp.where(dense, 1.0, -jnp.inf)
    cols, counts, _ = bs._cols_from_score(score, cap)
    eps = 0.3

    tbl = bs.walk_plan(cols, counts, cap)
    S_ref = bs.sinkhorn_step_walk(
        eps, x, x, a_log, a_log, f, f, tbl, None, p=p, block=block,
        sym=True,
    )[0]
    tblB = bs.walk_plan_banded(cols, counts, cap, n_tiles, band_tiles=4,
                               tri=True)
    # Triangle tables hold ~half the entries:
    words = np.asarray(tblB[0])
    live = words[np.isin((words >> 26) & 3, [0, 3])]
    rows = (live >> 13) & 0x1FFF
    jts = live & 0x1FFF
    assert (jts >= rows).all(), "triangle filter kept a lower tile"
    S_b = bs.sinkhorn_step_walk_banded_sym(
        eps, x, a_log, f, tblB, p=p, block=block, band_tiles=4
    )
    # Mirrored column sums reassociate the summation: ~1e-5 f32 slack.
    np.testing.assert_allclose(S_b, S_ref, rtol=3e-5, atol=3e-5)

    # Differentiable extrapolation: value + gradient parity.
    tblA = bs.walk_plan_banded(cols, counts, cap, n_tiles, band_tiles=2,
                               tri=True)
    a = jnp.full((x.shape[0],), 1.0 / x.shape[0])

    def loss_ref(xx):
        S = bs.softmin_extrapolation_walk_sym(
            xx, f, a_log, eps, tbl, p, block
        )
        return (a * S).sum()

    def loss_banded(xx):
        S = bs.softmin_extrapolation_walk_banded_sym(
            xx, f, a_log, eps, tblB, tblA, p, block,
            band_tiles=4, apply_band_tiles=2,
        )
        return (a * S).sum()

    v_ref, g_ref = jax.value_and_grad(loss_ref)(x)
    v_b, g_b = jax.value_and_grad(loss_banded)(x)
    np.testing.assert_allclose(v_b, v_ref, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(g_b, g_ref, rtol=1e-4, atol=2e-6)
