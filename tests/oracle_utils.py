"""Shared closed-form oracles and result comparators.

Mirrors the *strategy* of the reference's strongest test families
(``tests/generators/convex_gradients.py:34-131``,
``tests/generators/gaussians.py:304-455`` and
``tests/check_ot_result.py:38-73``) with our own constructions:

* :func:`brenier_pair` — deformations that are gradients of convex
  functions. By Brenier's theorem (and cyclical monotonicity of
  subdifferentials in the discrete case), the pairing ``x_i -> y_i`` is
  the exact optimal plan for the quadratic cost, with known value.
* :func:`uot_gaussian_1d` — the unbalanced entropic OT problem between
  1D Gaussians has a closed-form value, plan and total plan mass
  (Janati, Cuturi, Gramfort, "Entropic optimal transport between
  unbalanced Gaussian measures has a closed form", Theorem 3).
* :func:`assert_potentials_modulo_constant` — balanced dual pairs are
  only defined up to ``(f + c, g - c)``: compare centered potentials and
  the sum of the means.
"""

import numpy as np

__all__ = [
    "assert_potentials_modulo_constant",
    "brenier_pair",
    "uot_gaussian_1d",
    "gaussian_grid_weights",
]


def assert_potentials_modulo_constant(f_us, g_us, f_gt, g_gt, atol=1e-3):
    """Check a dual pair against a reference pair, modulo the additive
    gauge freedom ``(f + c, g - c)`` of balanced OT."""
    f_us, g_us = np.asarray(f_us, np.float64), np.asarray(g_us, np.float64)
    f_gt, g_gt = np.asarray(f_gt, np.float64), np.asarray(g_gt, np.float64)
    np.testing.assert_allclose(
        f_us.mean(-1) + g_us.mean(-1),
        f_gt.mean(-1) + g_gt.mean(-1),
        atol=atol,
        err_msg="sum of dual-potential means",
    )
    np.testing.assert_allclose(
        f_us - f_us.mean(-1, keepdims=True),
        f_gt - f_gt.mean(-1, keepdims=True),
        atol=atol,
        err_msg="potential_a (centered)",
    )
    np.testing.assert_allclose(
        g_us - g_us.mean(-1, keepdims=True),
        g_gt - g_gt.mean(-1, keepdims=True),
        atol=atol,
        err_msg="potential_b (centered)",
    )


def brenier_pair(seed, N, D, strength=0.3):
    r"""A point cloud and its image under the gradient of a convex map.

    We deform ``x`` with :math:`T(x) = x + \nabla\phi(x)` where
    :math:`\phi(x) = s \sum_j v_j |x - z_j|` is a convex sum of Euclidean
    norms. ``T`` is then the gradient of the convex function
    :math:`|x|^2/2 + \phi(x)`, so the diagonal pairing is cyclically
    monotone and hence the *exact* optimal plan for the quadratic cost.

    Returns:
        x ``(N, D)``, y ``(N, D)``, w ``(N,)`` (sums to 1), and the exact
        OT value for the cost ``C(x, y) = |x - y|^2 / 2``.
    """
    rng = np.random.RandomState(seed)
    # Jittered grid along the first axis keeps points well separated, so
    # that a small entropic blur resolves the diagonal plan:
    x = rng.rand(N, D)
    x[:, 0] = (np.arange(N) + 0.25 + 0.5 * rng.rand(N)) / N

    w = 0.05 + rng.rand(N)
    w = w / w.sum()

    v = strength * (0.1 + rng.rand(N)) / N
    z = rng.rand(N, D)

    diff = x[:, None, :] - z[None, :, :]  # (N, N, D)
    norms = np.sqrt((diff**2).sum(-1, keepdims=True))
    norms[norms == 0] = 1.0
    y = x + (v[None, :, None] * diff / norms).sum(axis=1)

    value = 0.5 * (w * ((x - y) ** 2).sum(-1)).sum()
    return x, y, w, value


def gaussian_grid_weights(grid, mean, std, mass=1.0):
    """Gaussian samples on a grid, normalized to sum to ``mass``."""
    w = np.exp(-0.5 * ((grid - mean) / std) ** 2)
    return mass * w / w.sum()


def uot_gaussian_1d(m_a, mu_a, A, m_b, mu_b, B, sigma, gamma):
    r"""Closed-form solution of 1D unbalanced entropic OT between Gaussians.

    Problem (Janati et al., Theorem 3, specialised to d = 1): minimize

    .. math::
        \int |x - y|^2 d\pi + 2\sigma^2 KL(\pi \| \alpha \otimes \beta)
        + \gamma KL(\pi_0 \| \alpha) + \gamma KL(\pi_1 \| \beta)

    between :math:`\alpha = m_a N(\mu_a, A)` and
    :math:`\beta = m_b N(\mu_b, B)` (variances ``A``, ``B``).

    Returns:
        dict with keys ``value`` (the optimal cost), ``mass`` (total plan
        mass :math:`m_\pi`) and ``plan`` — a function ``(x, y) -> (N, M)``
        sampling the continuous optimal plan density.
    """
    lam = sigma**2 + gamma / 2
    tau = gamma / (2 * sigma**2 + gamma)
    X = A + B + lam

    # Tilted variances and the plan's cross-covariance:
    A_t = 0.5 * gamma * A / (A + lam)
    B_t = 0.5 * gamma * B / (B + lam)
    C = np.sqrt(A_t * B_t / tau + sigma**4 / 4) - sigma**2 / 2

    # Total mass of the optimal plan:
    term_1 = sigma ** (sigma**2 / (gamma + sigma**2))
    term_2 = (m_a * m_b * C * np.sqrt((A_t * B_t) ** tau / (A * B))) ** (
        1.0 / (tau + 1.0)
    )
    term_3 = 1.0 / np.sqrt(C - (2.0 / gamma) * A_t * B_t)
    term_4 = np.exp(-((mu_a - mu_b) ** 2) / (X * 2 * (tau + 1)))
    m_pi = term_1 * term_2 * term_3 * term_4

    value = (
        gamma * (m_a + m_b)
        + 2 * sigma**2 * m_a * m_b
        - 2 * (sigma**2 + gamma) * m_pi
    )

    # Mean and covariance of the (Gaussian) optimal plan:
    mean = np.array(
        [mu_a + A * (mu_b - mu_a) / X, mu_b + B * (mu_a - mu_b) / X]
    )
    H = np.array(
        [
            [(1 + C / lam) * (A - A**2 / X), C + (1 + C / lam) * A * B / X],
            [C + (1 + C / lam) * A * B / X, (1 + C / lam) * (B - B**2 / X)],
        ]
    )

    def plan(x, y):
        det = H[0, 0] * H[1, 1] - H[0, 1] * H[1, 0]
        inv = np.array([[H[1, 1], -H[0, 1]], [-H[1, 0], H[0, 0]]]) / det
        dx = x[:, None] - mean[0]
        dy = y[None, :] - mean[1]
        quad = inv[0, 0] * dx**2 + 2 * inv[0, 1] * dx * dy + inv[1, 1] * dy**2
        dens = np.exp(-0.5 * quad) / (2 * np.pi * np.sqrt(det))
        return m_pi * dens

    return {"value": value, "mass": m_pi, "plan": plan}
