"""Batched tridiagonal (Thomas) solver.

Reference: ``CubicSpline::thomas``
(``/root/reference/src/interp1d/strategies/cubic_spline.rs:678-721``): a
forward sweep mutating ``a_mid`` and ``rhs`` followed by back substitution.
The reference vectorizes one solve across all trailing axes of ``rhs`` with
``Zip``; the diagonals are shared 1-D vectors.

TPU-native shape: the recurrence is inherently sequential along the knot
axis, so it is expressed as two ``lax.scan`` passes.  Everything *across*
the batch (all trailing axes, i.e. the spline bank) is vectorized inside
each scan step — one scan solves the whole bank simultaneously.  The
per-element operation order matches the reference exactly, so f64 results
are bit-identical:

    forward:  w       = a_low[i] / a_mid'[i-1]
              a_mid'[i] = a_mid[i] - w * a_up[i-1]
              rhs'[i]   = rhs[i]   - w * rhs'[i-1]
    backward: k[n-1] = rhs'[n-1] / a_mid'[n-1]
              k[i]   = (rhs'[i] - a_up[i] * k[i+1]) / a_mid'[i]

Generalization over the reference: the diagonals may themselves be batched
(shape ``(n, *batch)``) — this is what lets per-row ``Individual`` boundary
conditions solve in one batched pass instead of the reference's row-by-row
recursion (``cubic_spline.rs:370-403``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def thomas_solve(a_up, a_mid, a_low, rhs):
    """Solve the tridiagonal system ``A k = rhs`` along axis 0.

    Args:
      a_up:  (n,) or (n, *batch) upper diagonal (row i couples to i+1).
      a_mid: (n,) or (n, *batch) main diagonal.
      a_low: (n,) or (n, *batch) lower diagonal (row i couples to i-1).
      rhs:   (n, *batch) right-hand side(s).

    Returns:
      k with the same shape as ``rhs``.
    """
    n = rhs.shape[0]
    if n == 1:
        return rhs / a_mid[0]

    def fwd(carry, inp):
        a_mid_prev, rhs_prev = carry
        a_up_prev, a_mid_i, a_low_i, rhs_i = inp
        w = a_low_i / a_mid_prev
        a_mid_new = a_mid_i - w * a_up_prev
        rhs_new = rhs_i - w * rhs_prev
        return (a_mid_new, rhs_new), (a_mid_new, rhs_new)

    # Broadcast diagonals against the rhs batch so the scan carry has a
    # fixed shape whether or not the diagonals are batched.
    bshape = rhs.shape[1:]
    a_up_b = jnp.broadcast_to(
        a_up.reshape(a_up.shape + (1,) * (rhs.ndim - a_up.ndim)), (n, *bshape)
    )
    a_mid_b = jnp.broadcast_to(
        a_mid.reshape(a_mid.shape + (1,) * (rhs.ndim - a_mid.ndim)), (n, *bshape)
    )
    a_low_b = jnp.broadcast_to(
        a_low.reshape(a_low.shape + (1,) * (rhs.ndim - a_low.ndim)), (n, *bshape)
    )

    # unroll to amortize the per-step scan overhead on TPU (the recurrence
    # is latency-bound: each step is a handful of elementwise ops)
    unroll = 8 if n >= 64 else 1
    (_, _), (a_mid_swept, rhs_swept) = lax.scan(
        fwd,
        (a_mid_b[0], rhs[0]),
        (a_up_b[:-1], a_mid_b[1:], a_low_b[1:], rhs[1:]),
        unroll=unroll,
    )
    a_mid_full = jnp.concatenate([a_mid_b[:1], a_mid_swept], axis=0)
    rhs_full = jnp.concatenate([rhs[:1], rhs_swept], axis=0)

    k_last = rhs_full[-1] / a_mid_full[-1]

    def bwd(k_next, inp):
        a_up_i, a_mid_i, rhs_i = inp
        k_i = (rhs_i - a_up_i * k_next) / a_mid_i
        return k_i, k_i

    _, k_rev = lax.scan(
        bwd,
        k_last,
        (a_up_b[:-1], a_mid_full[:-1], rhs_full[:-1]),
        reverse=True,
        unroll=unroll,
    )
    return jnp.concatenate([k_rev, k_last[None]], axis=0)
