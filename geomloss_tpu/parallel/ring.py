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

from ..ops.softmin import gibbs_matvec, lse_points
from ..solvers.annealing import scaling_parameters
from ..solvers.sinkhorn_loop import log_weights, scal, sinkhorn_cost, sinkhorn_loop
from ..models.kernel_samples import _streaming_params, double_grad

__all__ = [
    "ring_lse",
    "ring_softmin",
    "ring_matvec",
    "sinkhorn_ring",
    "kernel_ring",
    "points_mesh",
]


def _pad_measure(w, pts, R):
    """Pad a weighted cloud to a multiple of the ring size with zero-weight
    duplicates of the last point (in-range coordinates: far-away sentinels
    would overflow the folded Gibbs exponents in f32)."""
    N = w.shape[0]
    Np = -(-N // R) * R
    if Np == N:
        return w, pts
    pad = Np - N
    w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    pts = jnp.concatenate([pts, jnp.broadcast_to(pts[-1:], (pad,) + pts.shape[1:])])
    return w, pts


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


def ring_matvec(x_local, y_local, v_local, eps, p, kind, axis_name, impl="auto"):
    """Kernel matvec ``sum_j k(x_i, y_j) v_j`` with ``(y, v)`` shards rotating
    around the ring; linear accumulation (the matvec analogue of
    :func:`ring_lse`). Must be called inside ``shard_map``."""
    R = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % R) for i in range(R)]

    def step(carry, _):
        acc, y_cur, v_cur = carry
        acc = acc + gibbs_matvec(x_local, y_cur, v_cur, eps, p, kind, impl)
        y_nxt = lax.ppermute(y_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        return (acc, y_nxt, v_nxt), None

    acc0 = jnp.zeros_like(x_local[:, 0])
    (acc, _, _), _ = lax.scan(step, (acc0, y_local, v_local), None, length=R)
    return acc


def kernel_ring(
    a,
    x,
    b,
    y,
    name="gaussian",
    blur=0.05,
    mesh=None,
    axis="points",
    potentials=False,
    impl="auto",
):
    r"""Multi-chip kernel (MMD) loss: the three matvecs of
    :func:`~geomloss_tpu.models.kernel_samples.kernel_loss` run as ring
    reductions, with the same detached-partner / doubled-gradient
    bookkeeping. ``N`` and ``M`` are padded to mesh multiples internally.

    Returns the scalar loss (replicated across devices), or the pair of
    *global* potential arrays when ``potentials=True``.
    """
    if mesh is None:
        mesh = points_mesh(axis=axis)
    R = mesh.devices.size
    N, M = a.shape[0], b.shape[0]
    a, x = _pad_measure(a, x, R)
    b, y = _pad_measure(b, y, R)

    p, kind = _streaming_params[name]
    eps = jnp.asarray(blur**p if kind == "gibbs" else 1.0, x.dtype)

    def solve(a_l, x_l, b_l, y_l):
        sg = lax.stop_gradient
        mv = partial(ring_matvec, eps=eps, p=p, kind=kind, axis_name=axis,
                     impl=impl)
        a_x = mv(double_grad(x_l), sg(x_l), sg(a_l))
        b_y = mv(double_grad(y_l), sg(y_l), sg(b_l))
        b_x = mv(x_l, y_l, b_l)
        if potentials:
            a_y = mv(y_l, x_l, a_l)
            return a_x - b_x, b_y - a_y
        local = (
            0.5 * scal(double_grad(a_l), a_x)
            + 0.5 * scal(double_grad(b_l), b_y)
            - scal(a_l, b_x)
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
    out = fn(a, x, b, y)
    if potentials:
        F, G = out
        return F[:N], G[:M]
    return out


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
        a: ``(N,)``; x: ``(N, D)``; b: ``(M,)``; y: ``(M, D)``. Any sizes:
            the clouds are padded internally to mesh multiples with
            zero-weight points.
        mesh: a 1D ``jax.sharding.Mesh`` (default: all devices).

    Returns:
        Scalar divergence (replicated across devices), or — with
        ``potentials=True`` — the pair of *global* ``(N,)``/``(M,)``
        potential arrays (shard_map with sharded out_specs reassembles the
        shards; no manual gather is needed).
    """
    if mesh is None:
        mesh = points_mesh(axis=axis)
    R = mesh.devices.size
    N, M = a.shape[0], b.shape[0]
    a, x = _pad_measure(a, x, R)
    b, y = _pad_measure(b, y, R)

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
    out = fn(a, x, b, y)
    if potentials:
        F, G = out
        return F[:N], G[:M]
    return out
