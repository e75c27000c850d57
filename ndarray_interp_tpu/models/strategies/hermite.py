"""Akima and PCHIP strategies — tier-(a) proof of the strategy protocol.

The reference crate exposes a strategy extension trait
(``/root/reference/src/interp1d/strategies/mod.rs``) and BASELINE.json
config 4 calls for Akima + PCHIP landing through it.  Both are cubic
*Hermite* splines: they differ from :class:`CubicSpline` only in how the
knot derivatives ``k`` are chosen (local formulas instead of a global
tridiagonal solve).  They therefore compile to the same per-interval
``(a, b)`` representation (``cubic_spline.rs:350-367``)::

    a[i] = k[i]·dx[i] - dy[i]
    b[i] = dy[i] - k[i+1]·dx[i]

and share :class:`CubicSplineStrategy`'s evaluation — including the fused
Pallas bucketize→gather→Hermite kernel.  Slope formulas follow SciPy
(`Akima1DInterpolator`, `PchipInterpolator`), which the reference treats
as its numerical oracle (``tests/cubic_spline_strat.rs:19-26``).

All slope computations are elementwise across the trailing (bank) axes,
so building a bank of Akima/PCHIP splines is one vectorized program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .base import Interp1DStrategyBuilder
from .cubic import CubicSplineStrategy, _ab_from_k


def _ex(v, tr):
    return v.reshape(v.shape + (1,) * tr)


@functools.partial(jax.jit, static_argnames="method")
def _akima_k(x, y, method="akima"):
    """Akima's 1970 slope rule (vectorized, SciPy-compatible).

    ``method="makima"`` applies the modified-Akima weights
    (MATLAB's makima; SciPy ``Akima1DInterpolator(method="makima")``):
    each weight gains ``|m_a + m_b| / 2``, which breaks the 0/0 tie on
    locally flat data toward the average slope and damps overshoot."""
    tr = y.ndim - 1
    dx = _ex(x[1:] - x[:-1], tr)
    m = (y[1:] - y[:-1]) / dx  # (n-1, *bank)
    # extend with two fictitious slopes on each side
    m1 = 2.0 * m[0] - m[1]
    m0 = 2.0 * m1 - m[0]
    mn = 2.0 * m[-1] - m[-2]
    mn1 = 2.0 * mn - m[-1]
    me = jnp.concatenate(
        [m0[None], m1[None], m, mn[None], mn1[None]], axis=0
    )  # (n+3, *bank)
    dm = jnp.abs(me[1:] - me[:-1])  # (n+2, *bank)
    if method == "makima":
        pm = jnp.abs(me[1:] + me[:-1])  # (n+2, *bank)
        f1 = dm[2:] + 0.5 * pm[2:]
        f2 = dm[:-2] + 0.5 * pm[:-2]
    else:
        f1 = dm[2:]  # |m[i+1]-m[i]|
        f2 = dm[:-2]  # |m[i-1]-m[i-2]|
    f12 = f1 + f2
    m_im1 = me[1:-2]
    m_i = me[2:-1]
    default = 0.5 * (m_im1 + m_i)
    # SciPy guards the division with f12 > 1e-9 * max(f12)
    thresh = 1e-9 * jnp.max(f12)
    safe = f12 > thresh
    t = jnp.where(
        safe, (f1 * m_im1 + f2 * m_i) / jnp.where(safe, f12, 1.0), default
    )
    return t  # (n, *bank) knot derivatives


@jax.jit
def _pchip_k(x, y):
    """Fritsch–Carlson monotone slopes (vectorized, SciPy-compatible)."""
    tr = y.ndim - 1
    h = _ex(x[1:] - x[:-1], tr)  # (n-1, 1...)
    m = (y[1:] - y[:-1]) / h  # (n-1, *bank)
    n = y.shape[0]

    if n == 2:
        return jnp.concatenate([m, m], axis=0)

    hk_1, hk = h[:-1], h[1:]
    mk_1, mk = m[:-1], m[1:]
    # interior: weighted harmonic mean where slopes share a sign
    w1 = 2.0 * hk + hk_1
    w2 = hk + 2.0 * hk_1
    smk = jnp.sign(mk)
    condition = (jnp.sign(mk_1) != smk) | (mk == 0) | (mk_1 == 0)
    mk_1s = jnp.where(condition, 1.0, mk_1)  # avoid 0-division
    mks = jnp.where(condition, 1.0, mk)
    whmean = (w1 / mk_1s + w2 / mks) / (w1 + w2)
    dk_interior = jnp.where(condition, 0.0, 1.0 / whmean)

    def edge(h0, h1, m0, m1):
        # SciPy's one-sided three-point estimate with sign fix-ups
        d = ((2.0 * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
        mask = jnp.sign(d) != jnp.sign(m0)
        mask2 = (jnp.sign(m0) != jnp.sign(m1)) & (
            jnp.abs(d) > 3.0 * jnp.abs(m0)
        )
        d = jnp.where(mask, 0.0, d)
        return jnp.where(~mask & mask2, 3.0 * m0, d)

    d0 = edge(h[0], h[1], m[0], m[1])
    dn = edge(h[-1], h[-2], m[-1], m[-2])
    return jnp.concatenate([d0[None], dk_interior, dn[None]], axis=0)


class _HermiteBuilder(Interp1DStrategyBuilder):
    """Shared builder: compute slopes, lower to (a, b), reuse the cubic
    evaluation strategy (incl. the fused kernel)."""

    MINIMUM_DATA_LENGTH = 3

    def __init__(self, extrapolate: bool = False):
        self.extrapolates = bool(extrapolate)

    def extrapolate(self, yes: bool = True):
        return type(self)(extrapolate=yes)

    def _slopes(self, x, data):
        raise NotImplementedError

    def build(self, x, data) -> CubicSplineStrategy:
        if not jnp.issubdtype(data.dtype, jnp.inexact):
            raise TypeError(
                f"{type(self).__name__} requires a floating-point dtype; "
                f"got {data.dtype}"
            )
        k = self._slopes(x, data)
        a, b = _ab_from_k(x, data, k)
        return CubicSplineStrategy(
            a, b, "yes" if self.extrapolates else "no"
        )


class Akima(_HermiteBuilder):
    """Akima (1970) spline: local slope rule robust to outliers."""

    MINIMUM_DATA_LENGTH = 3

    def _slopes(self, x, data):
        return _akima_k(x, data)

    def __repr__(self):
        return f"Akima(extrapolate={self.extrapolates})"


class Makima(_HermiteBuilder):
    """Modified Akima (MATLAB's ``makima``; SciPy
    ``Akima1DInterpolator(method="makima")``): Akima's rule with
    ``|m_a + m_b|/2`` added to each weight — flat-region ties resolve
    to the average slope and overshoot is damped."""

    MINIMUM_DATA_LENGTH = 3

    def _slopes(self, x, data):
        return _akima_k(x, data, method="makima")

    def __repr__(self):
        return f"Makima(extrapolate={self.extrapolates})"


class Pchip(_HermiteBuilder):
    """PCHIP: shape-preserving monotone cubic Hermite interpolation."""

    MINIMUM_DATA_LENGTH = 2

    def _slopes(self, x, data):
        return _pchip_k(x, data)

    def __repr__(self):
        return f"Pchip(extrapolate={self.extrapolates})"
