"""Serving helpers: fixed-shape evaluation for variable-length queries.

Under ``jit`` every new query-batch shape triggers a recompile — fatal for
a serving path fed requests of arbitrary size.  :class:`Evaluator` pads
each batch up to a size bucket (powers of two by default), evaluates with
a single compiled program per bucket, and slices the padding off.  Padding
uses the first knot, so it never produces out-of-range work regardless of
the extrapolation mode.

    ev = Evaluator(interp)
    ev.warmup()              # optional: precompile every bucket
    values = ev(queries)     # any length, no recompiles after warmup
"""

from __future__ import annotations

import bisect

import jax
import jax.numpy as jnp


def _default_buckets(max_size: int):
    out, b = [], 256
    while b < max_size:
        out.append(b)
        b *= 2
    out.append(max_size)
    return out


class Evaluator:
    """Bucketed fixed-shape evaluator over an :class:`Interp1D`.

    Args:
      interp: the interpolator (pytree; captured as a constant so the
        compiled programs specialize to its shapes).
      max_batch: largest supported query count per call (larger inputs are
        evaluated in ``max_batch`` chunks).
      buckets: optional ascending list of batch buckets.
      donate: unused placeholder for future device-buffer donation.
    """

    def __init__(self, interp, max_batch: int = 1 << 20, buckets=None):
        self._interp = interp
        self._buckets = sorted(buckets or _default_buckets(max_batch))
        self._max = self._buckets[-1]
        self._fn = jax.jit(lambda t, q: t(q))

    def _bucket(self, n: int) -> int:
        i = bisect.bisect_left(self._buckets, n)
        return self._buckets[min(i, len(self._buckets) - 1)]

    def warmup(self):
        """Precompile every bucket (one trace + compile each)."""
        pad_val = self._interp.x[0]
        for b in self._buckets:
            q = jnp.full((b,), pad_val, self._interp.x.dtype)
            self._fn(self._interp, q)
        return self

    def __call__(self, queries):
        q = jnp.asarray(queries)
        shape = q.shape
        flat = q.reshape(-1)
        n = flat.shape[0]
        pad_val = self._interp.x[0]

        outs = []
        start = 0
        while start < n:
            chunk = flat[start : start + self._max]
            m = chunk.shape[0]
            b = self._bucket(m)
            padded = jnp.full((b,), pad_val, flat.dtype).at[:m].set(chunk)
            outs.append(self._fn(self._interp, padded)[:m])
            start += m
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return out.reshape(shape + tuple(self._interp.data.shape[1:]))

    @property
    def buckets(self):
        return tuple(self._buckets)
