r"""Ring softmin: multi-chip Sinkhorn over a device mesh.

The reference has no distributed backend (SURVEY §2.3): its scaling trick
is KeOps tiling on one GPU. On TPU pods, the natural scale-out of the
``N x M`` softmin reduction is a **ring reduction over the ICI**,
structurally identical to ring attention:

* shard the source points ``x`` (rows) and target points ``y`` (columns)
  across the mesh axis;
* every step, each device computes the streaming LSE of its ``x``-shard
  against the currently-held ``y``-shard, merges it into its accumulator
  with ``logaddexp`` (the exact merge for partial LSE values), and
  rotates the ``y``-shard to its ring neighbour with ``lax.ppermute``;
* after ``R`` steps every device holds the full softmin of its rows.

Everything is differentiable (JAX transposes ``ppermute`` automatically
and the per-shard LSE carries its analytic VJP), so the envelope-theorem
gradient of the sharded Sinkhorn loop works unchanged.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.softmin import lse_points
from ..solvers.annealing import scaling_parameters
from ..solvers.sinkhorn_loop import log_weights, sinkhorn_cost, sinkhorn_loop

__all__ = ["ring_lse", "ring_softmin", "sinkhorn_ring", "points_mesh"]


def points_mesh(n_devices=None, axis="points"):
    """A 1D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def ring_lse(x_local, y_local, h_local, eps, p, axis_name, impl="auto"):
    """Full-row LSE of sharded ``x`` against ring-rotated shards of ``(y, h)``.

    Must be called inside ``shard_map`` over ``axis_name``. Shapes are the
    local shards: ``x_local (n, D)``, ``y_local (m, D)``, ``h_local (m,)``.
    Returns the ``(n,)`` LSE over the *global* M axis.
    """
    R = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % R) for i in range(R)]

    def step(carry, _):
        acc, y_cur, h_cur = carry
        part = lse_points(x_local, y_cur, h_cur, eps, p, impl)
        acc = jnp.logaddexp(acc, part)
        y_nxt = lax.ppermute(y_cur, axis_name, perm)
        h_nxt = lax.ppermute(h_cur, axis_name, perm)
        return (acc, y_nxt, h_nxt), None

    # Derive the accumulator from a varying input so shard_map marks it as
    # device-varying over the ring axis:
    acc0 = jnp.full_like(x_local[:, 0], -jnp.inf)
    (acc, _, _), _ = lax.scan(step, (acc0, y_local, h_local), None, length=R)
    return acc


def ring_softmin(eps, C_xy, h, p=2, axis_name="points", impl="auto"):
    """Sharded softmin: drop-in `softmin` for ``sinkhorn_loop`` inside shard_map."""
    x_local, y_local = C_xy
    eps = jnp.asarray(eps, dtype=x_local.dtype)
    return -eps * ring_lse(x_local, y_local, h, eps, p, axis_name, impl=impl)


def sinkhorn_ring(
    a,
    x,
    b,
    y,
    mesh=None,
    axis="points",
    p=2,
    blur=0.05,
    reach=None,
    diameter=None,
    scaling=0.5,
    debias=True,
    potentials=False,
    impl="auto",
):
    """Debiased Sinkhorn divergence with all four point axes sharded
    across a 1D device mesh; the whole annealing loop runs inside one
    ``shard_map`` so the only cross-chip traffic is the ``ppermute`` ring.

    Args:
        a: ``(N,)``; x: ``(N, D)``; b: ``(M,)``; y: ``(M, D)``.
            ``N`` and ``M`` must be divisible by the mesh size.
        mesh: a 1D ``jax.sharding.Mesh`` (default: all devices).

    Returns:
        Scalar divergence (replicated), or sharded potentials.
    """
    if mesh is None:
        mesh = points_mesh(axis=axis)

    diameter, eps, eps_list, rho = scaling_parameters(
        x, y, p, blur, reach, diameter, scaling
    )

    softmin = partial(ring_softmin, p=p, axis_name=axis, impl=impl)

    def solve(a_l, x_l, b_l, y_l):
        sg = lax.stop_gradient
        C_xy, C_yx = (x_l, sg(y_l)), (y_l, sg(x_l))
        C_xx, C_yy = ((x_l, sg(x_l)), (y_l, sg(y_l))) if debias else (None, None)

        f_aa, g_bb, g_ab, f_ba = sinkhorn_loop(
            softmin,
            log_weights(a_l),
            log_weights(b_l),
            C_xx,
            C_yy,
            C_xy,
            C_yx,
            eps_list,
            rho,
            debias=debias,
        )
        if potentials:
            return sinkhorn_cost(
                eps, rho, a_l, b_l, f_aa, g_bb, g_ab, f_ba,
                batch=False, debias=debias, potentials=True,
            )
        # Local partial dot products, then a psum over the ring:
        local = sinkhorn_cost(
            eps, rho, a_l, b_l, f_aa, g_bb, g_ab, f_ba,
            batch=False, debias=debias, potentials=False,
        )
        return lax.psum(local, axis)

    sharded = P(axis)
    sharded2 = P(axis, None)
    out_specs = (sharded, sharded) if potentials else P()
    fn = jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(sharded, sharded2, sharded, sharded2),
        out_specs=out_specs,
    )
    return fn(a, x, b, y)
