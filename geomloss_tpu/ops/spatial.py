r"""Scalable spatial ordering: Hilbert keys + linear-time radix sort.

The multiscale solver needs points ordered so that fixed-size blocks are
spatially compact. For moderate sizes we use a recursive KD sort built on
``jnp.argsort`` — but XLA's TPU sort lowers to a bitonic network whose
compile time explodes beyond a few hundred thousand elements. This module
provides the large-scale path:

* :func:`hilbert_key` — 3D/2D Hilbert curve indices via Skilling's
  transpose algorithm ("Programming the Hilbert curve", AIP 2004):
  pure vectorized bit manipulation, unrolled over ~10 bit planes.
  Hilbert order has far better locality than Z-order (no long jumps),
  giving near-KD tile compactness.
* :func:`radix_sort_perm` — stable LSD radix argsort of non-negative
  int keys using one-hot histograms and cumulative sums only: O(N) work
  per pass, O(passes) compile size, no ``lax.sort`` anywhere.
"""

import jax
import jax.numpy as jnp

__all__ = ["hilbert_key", "radix_sort_perm"]


def _spread_bits_2(v):
    """Insert two zero bits between each of the low 10 bits."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def _spread_bits_1(v):
    """Insert one zero bit between each of the low 15 bits."""
    v = v & 0x7FFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def hilbert_key(x, bits=10):
    """Hilbert-curve index of each point of ``x`` on a ``2^bits`` grid.

    Args:
        x: ``(N, D)`` float coordinates, D in {1, 2, 3}.
        bits: bits per axis (10 -> 30-bit keys for D=3).

    Returns:
        ``(N,)`` int32 keys; sorting by them yields a Hilbert traversal.
    """
    N, D = x.shape
    n_bins = 1 << bits
    mins = x.min(axis=0)
    scale = jnp.maximum(x.max(axis=0) - mins, 1e-12)
    Xi = jnp.clip(
        jnp.floor((x - mins) / scale * n_bins), 0, n_bins - 1
    ).astype(jnp.int32)

    if D == 1:
        return Xi[:, 0]

    X = [Xi[:, i] for i in range(D)]

    # --- Skilling: AxesToTranspose ------------------------------------------
    for q_exp in range(bits - 1, 0, -1):
        Q = 1 << q_exp
        P = Q - 1
        for i in range(D):
            cond = (X[i] & Q) != 0
            # if: invert low bits of X[0]; else: exchange low bits of X[0], X[i]
            t = (X[0] ^ X[i]) & P
            X0_if = X[0] ^ P
            X0_else = X[0] ^ t
            Xi_else = X[i] ^ t
            new_X0 = jnp.where(cond, X0_if, X0_else)
            new_Xi = jnp.where(cond, X[i], Xi_else)
            if i == 0:
                X[0] = new_X0
            else:
                X[0] = new_X0
                X[i] = new_Xi

    # Gray encode:
    for i in range(1, D):
        X[i] = X[i] ^ X[i - 1]
    t2 = jnp.zeros_like(X[0])
    for q_exp in range(bits - 1, 0, -1):
        Q = 1 << q_exp
        t2 = jnp.where((X[D - 1] & Q) != 0, t2 ^ (Q - 1), t2)
    for i in range(D):
        X[i] = X[i] ^ t2

    # --- Interleave the transpose into a single index ------------------------
    if D == 2:
        key = (_spread_bits_1(X[0]) << 1) | _spread_bits_1(X[1])
    else:
        key = (
            (_spread_bits_2(X[0]) << 2)
            | (_spread_bits_2(X[1]) << 1)
            | _spread_bits_2(X[2])
        )
    return key


def radix_sort_perm(keys, total_bits=30, radix_bits=9):
    """Stable LSD radix argsort of non-negative integer keys.

    Built from one-hot histograms + cumulative sums only (no ``lax.sort``):
    compiles in O(total_bits / radix_bits) passes regardless of N.

    TPU notes: the dominant costs are the random-access scatters (one
    per payload per pass) and the ``(N, R)`` one-hot cumsum.
    ``radix_bits=9`` trades a wider cumsum for fewer passes (2 at the
    18-bit keys the multiscale sort uses); scattering the payloads
    directly skips the inverse permutation + gathers of the naive
    formulation (one random-access op per payload instead of two).

    Returns:
        ``(N,)`` int32 permutation such that ``keys[perm]`` is sorted.
    """
    N = keys.shape[0]
    R = 1 << radix_bits
    idx = jnp.arange(N, dtype=jnp.int32)
    k = keys.astype(jnp.int32)

    for shift in range(0, total_bits, radix_bits):
        b = (k >> shift) & (R - 1)  # (N,)
        oh = jax.nn.one_hot(b, R, dtype=jnp.int32)  # (N, R)
        within = jnp.cumsum(oh, axis=0)  # inclusive per-bucket counts
        eq_rank = jnp.take_along_axis(within, b[:, None], axis=1)[:, 0]  # 1-based
        totals = within[-1]  # (R,)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(totals)[:-1].astype(jnp.int32)]
        )
        rank = offsets[b] + eq_rank - 1  # (N,) target positions
        # Scatter the payloads directly to their target positions (one
        # random-access op each) instead of materializing the inverse
        # permutation and gathering through it:
        scat = lambda v: jnp.zeros((N,), jnp.int32).at[rank].set(v)
        idx = scat(idx)
        if shift + radix_bits < total_bits:
            k = scat(k)

    return idx
