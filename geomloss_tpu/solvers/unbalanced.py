r"""Unbalanced OT support for the new ``ot.solve*`` API.

Re-implementation of
``/root/reference/src/geomloss/ot/_abstract_solvers/unbalanced_ot.py``:
the ``dampening`` *function* factory and the batched ``sinkhorn_cost``
that converts optimal dual potentials into divergence values, including
the Sejourne et al. (arXiv:1910.12958) unbalanced formulas with their
mass constants.

Note on gradients: the reference's ``bk.scale(x, forward=..., backward=...)``
relies on a torch ``nn.Module.backward`` that torch autograd never calls,
so its *effective* gradient uses the forward factor; we reproduce that
behaviour (see ``solvers.sinkhorn_loop.unbalanced_weight``).
"""

from typing import Optional

import jax.numpy as jnp

from ..utils.typing import SinkhornPotentials

__all__ = ["dampening", "dot_products", "sinkhorn_cost"]


def dampening(*, eps: float, rho: Optional[float]):
    """Dampening function: identity for balanced OT, contraction otherwise."""
    if rho is None:
        return lambda f: f
    return lambda f: f / (1 + eps / rho)


def dot_products(a, f):
    """Batchwise dot products — the first axis is ALWAYS treated as batch
    (reference ``_backends/torch.py:28-32``)."""
    assert a.shape == f.shape
    B = a.shape[0]
    return (a.reshape(B, -1) * f.reshape(B, -1)).sum(axis=1)


def sinkhorn_cost(
    *,
    a,
    b,
    batchsize: int,
    potentials: SinkhornPotentials,
    eps: float,
    rho: Optional[float],
    debias: bool = True,
):
    """Values of the Sinkhorn divergence from optimal dual potentials.

    Faithful port of ``unbalanced_ot.py:21-181`` (all four
    {debias} x {balanced} cases, with the biased-unbalanced mass
    constants).
    """
    f_aa, g_bb = potentials.f_aa, potentials.g_bb
    g_ab, f_ba = potentials.g_ab, potentials.f_ba

    assert f_ba.shape == a.shape
    assert g_ab.shape == b.shape

    if batchsize == 0:
        a, b = a[None, ...], b[None, ...]
        f_ba, g_ab = f_ba[None, ...], g_ab[None, ...]
        if f_aa is not None:
            f_aa = f_aa[None, ...]
        if g_bb is not None:
            g_bb = g_bb[None, ...]

    assert eps > 0
    assert rho is None or rho > 0

    if rho is None:
        if not debias:
            F_a, G_b = f_ba, g_ab
        else:
            F_a, G_b = f_ba - f_aa, g_ab - g_bb
    else:
        if not debias:
            F_a = -jnp.exp(-f_ba / rho)
            G_b = -jnp.exp(-g_ab / rho)
            m_a = a.reshape(a.shape[0], -1).sum(-1).reshape(
                (-1,) + (1,) * (a.ndim - 1)
            )
            m_b = b.reshape(b.shape[0], -1).sum(-1).reshape(
                (-1,) + (1,) * (b.ndim - 1)
            )
            Cst_a = (rho + (eps / 2) * m_b) * jnp.ones_like(F_a)
            Cst_b = (rho + (eps / 2) * m_a) * jnp.ones_like(G_b)
            F_a = Cst_a + (rho + eps / 2) * F_a
            G_b = Cst_b + (rho + eps / 2) * G_b
        else:
            F_a = jnp.exp(-f_aa / rho) - jnp.exp(-f_ba / rho)
            G_b = jnp.exp(-g_bb / rho) - jnp.exp(-g_ab / rho)
            F_a = (rho + eps / 2) * F_a
            G_b = (rho + eps / 2) * G_b

    total_costs = dot_products(a, F_a) + dot_products(b, G_b)

    assert total_costs.shape == (max(batchsize, 1),)
    if batchsize == 0:
        total_costs = total_costs[0]
    return total_costs
