"""Bilinear interpolation strategy on a rectilinear grid.

Reference: ``/root/reference/src/interp2d/strategies/bilinear.rs``.
Stateless config in the reference; evaluation per point is: two range
checks, two searchsorteds, four corner lookups, then two x-direction
lerps followed by one y-direction lerp (``bilinear.rs:64-98``).  Here the
whole query batch does this at once: two bucketizes + one 4-corner gather
+ three fused lerps.  When built through the builder on floating data,
the finished strategy precomputes the packed corner-row table (all four
corners + the interval endpoints per cell) so evaluation is exactly one
row gather per query — :class:`BilinearPacked`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from ...ops.lerp import calc_frac
from .base2d import Interp2DStrategy, Interp2DStrategyBuilder


def pack_corner_rows(x, y, data):
    """Packed per-cell rows: 4 corner blocks (contiguous — a corner-minor
    layout would force strided relayouts) + the 4 interval endpoints.
    Everything a query needs is then ONE contiguous row gather; even the
    four scalar endpoint gathers measured ~20 ms/1M queries as separate
    XLA ops."""
    nx, ny = data.shape[0], data.shape[1]
    trailing = data.shape[2:]
    r = 1
    for s_ in trailing:
        r *= s_
    quad = jnp.stack(
        [data[:-1, :-1], data[:-1, 1:], data[1:, :-1], data[1:, 1:]],
        axis=2,
    ).reshape(nx - 1, ny - 1, 4 * r)
    ends = jnp.stack(
        [
            jnp.broadcast_to(x[:-1, None], (nx - 1, ny - 1)),
            jnp.broadcast_to(x[1:, None], (nx - 1, ny - 1)),
            jnp.broadcast_to(y[None, :-1], (nx - 1, ny - 1)),
            jnp.broadcast_to(y[None, 1:], (nx - 1, ny - 1)),
        ],
        axis=-1,
    ).astype(data.dtype)
    return jnp.concatenate([quad, ends], axis=-1).reshape(
        (nx - 1) * (ny - 1), 4 * r + 4
    )


# precompute the packed table at build only below this data size (the
# table quadruples the grid's memory)
_PACK_MAX_ELEMS = 64 * 1024 * 1024


@register_pytree_node_class
class Bilinear(Interp2DStrategy, Interp2DStrategyBuilder):
    MINIMUM_DATA_LENGTH = 2  # bilinear.rs:41

    def __init__(self, extrapolate: bool = False):
        self.extrapolates = bool(extrapolate)

    def extrapolate(self, yes: bool = True) -> "Bilinear":
        """Chainable config (``bilinear.rs:20-23``)."""
        return Bilinear(extrapolate=yes)

    def build(self, x, y, data):
        if (
            jnp.issubdtype(data.dtype, jnp.floating)
            and x.dtype == data.dtype
            and data.size <= _PACK_MAX_ELEMS
        ):
            return BilinearPacked(
                pack_corner_rows(x, y, data), self.extrapolates
            )
        return self

    def eval(self, interp, xq, yq):
        # NOTE round-2 negative result (measured on v5e, NS3 workload):
        # the "fully fused" gather route — fused_cell_index + one packed
        # gather + a streaming Pallas lerp tail (ops/pallas_tail.py,
        # kept with tests) — measured 18.2 ms vs 8.2 ms for this
        # separated path.  Anatomy: the cell kernel costs 1.8 ms vs
        # 0.6 ms for two fused_lower_index passes (confirming round 1's
        # measurement), and the Pallas tail on 68-lane unaligned blocks
        # runs at ~43 GB/s (7.9 ms) vs ~1.9 ms for XLA's fused lerps.
        # The packed-row gather's ~6 ms is the hardware floor either way
        # (docs/ROADMAP.md, gather-engine wall).
        import jax

        from ...ops.searchsorted import lower_index_fast

        x, y, data = interp.x, interp.y, interp.data
        # two-level Pallas bucketize on TPU (~4x the flat compare-and-count)
        xi = lower_index_fast(x, xq)
        yi = lower_index_fast(y, yq)

        def tpu_corners(xi, yi):
            # one packed-row gather per query (see pack_corner_rows);
            # packed at build when possible, else assembled here (fused
            # into the surrounding program by XLA)
            ny = data.shape[1]
            trailing = data.shape[2:]
            r = 1
            for s in trailing:
                r *= s
            rows = self._rows()
            if rows is None:
                rows = pack_corner_rows(x, y, data)
            flat = xi * (ny - 1) + yi
            g2 = jnp.take(rows, flat, axis=0)
            out_shape = flat.shape + trailing
            return (
                g2[:, 0 * r : 1 * r].reshape(out_shape),
                g2[:, 1 * r : 2 * r].reshape(out_shape),
                g2[:, 2 * r : 3 * r].reshape(out_shape),
                g2[:, 3 * r : 4 * r].reshape(out_shape),
                g2[:, 4 * r],
                g2[:, 4 * r + 1],
                g2[:, 4 * r + 2],
                g2[:, 4 * r + 3],
            )

        def default_corners(xi, yi):
            # 4-corner gather, (Q, *data.shape[2:]) each
            return (
                data[xi, yi],
                data[xi, yi + 1],
                data[xi + 1, yi],
                data[xi + 1, yi + 1],
                x[xi].astype(data.dtype),
                x[xi + 1].astype(data.dtype),
                y[yi].astype(data.dtype),
                y[yi + 1].astype(data.dtype),
            )

        if jnp.issubdtype(data.dtype, jnp.floating) and x.dtype == data.dtype:
            z11, z12, z21, z22, x1, x2, y1, y2 = jax.lax.platform_dependent(
                xi, yi, tpu=tpu_corners, default=default_corners
            )
        else:
            z11, z12, z21, z22, x1, x2, y1, y2 = default_corners(xi, yi)

        expand = xq.shape + (1,) * (data.ndim - 2)

        def e(v):
            return v.reshape(expand)

        # same lerp composition/order as bilinear.rs:88-97
        z1 = calc_frac(e(x1), z11, e(x2), z21, e(xq))
        z2 = calc_frac(e(x1), z12, e(x2), z22, e(xq))
        return calc_frac(e(y1), z1, e(y2), z2, e(yq))

    # -- calculus (beyond reference; SciPy-style surface) ---------------------
    def eval_derivative(self, interp, xq, yq, dx=0, dy=0):
        """Analytic partials of the bilinear surface: per-cell constant
        slopes along each axis, the mixed (1,1) twist term
        ``(z22 - z21 - z12 + z11)/(Δx·Δy)``, and identically zero for
        any order ≥ 2 (away from the grid lines, where the
        distributional derivative is undefined).  Plain 4-corner XLA
        gathers — the derivative path is not the hot eval route."""
        if dx not in (0, 1, 2, 3) or dy not in (0, 1, 2, 3):
            raise ValueError(
                f"derivative orders must be in 0..3; got dx={dx}, dy={dy}"
            )
        from ...ops.searchsorted import lower_index_fast

        x, y, data = interp.x, interp.y, interp.data
        xi = lower_index_fast(x, xq)
        yi = lower_index_fast(y, yq)
        z11 = data[xi, yi]
        z12 = data[xi, yi + 1]
        z21 = data[xi + 1, yi]
        z22 = data[xi + 1, yi + 1]
        expand = xq.shape + (1,) * (data.ndim - 2)

        def e(v):
            return v.reshape(expand)

        x1, x2 = e(x[xi]), e(x[xi + 1])
        y1, y2 = e(y[yi]), e(y[yi + 1])
        dxv = x2 - x1
        dyv = y2 - y1
        if dx == 0 and dy == 0:
            z1 = calc_frac(x1, z11, x2, z21, e(xq))
            z2 = calc_frac(x1, z12, x2, z22, e(xq))
            return calc_frac(y1, z1, y2, z2, e(yq))
        if dx == 1 and dy == 0:
            return calc_frac(
                y1, (z21 - z11) / dxv, y2, (z22 - z12) / dxv, e(yq)
            )
        if dx == 0 and dy == 1:
            z1 = calc_frac(x1, z11, x2, z21, e(xq))
            z2 = calc_frac(x1, z12, x2, z22, e(xq))
            return (z2 - z1) / dyv
        if dx == 1 and dy == 1:
            return (z22 - z21 - z12 + z11) / (dxv * dyv)
        return jnp.zeros_like((z11 - z11) / dxv)  # any order >= 2

    def eval_integrate_box(self, interp, xlo, xhi, ylo, yhi):
        """Exact ``∫∫ z dx dy`` over ``[xlo,xhi]×[ylo,yhi]`` per
        trailing element: the per-axis integral weights of the
        tensor-product linear basis contracted against the data grid
        (the ``InterpND`` box-quadrature machinery at ``k=2``).  Signed
        per axis; extrapolating strategies integrate the extended edge
        cells."""
        from ..interpnd import _integrate_fn

        x, y = interp.x, interp.y
        # force an inexact type: integer grids (a supported eval path)
        # would otherwise truncate fractional bounds and crash in the
        # antiderivative-weight machinery (jnp.finfo on an int dtype)
        bt = jnp.result_type(x.dtype, y.dtype, jnp.float32)
        los = jnp.stack(
            [jnp.asarray(xlo).astype(bt), jnp.asarray(ylo).astype(bt)]
        )
        his = jnp.stack(
            [jnp.asarray(xhi).astype(bt), jnp.asarray(yhi).astype(bt)]
        )
        fn = _integrate_fn(2, None, "linear", self.extrapolates)
        data = interp.data
        if not jnp.issubdtype(data.dtype, jnp.inexact):
            data = data.astype(bt)
        return fn((x.astype(bt), y.astype(bt)), data, los, his)

    def _rows(self):
        return None

    def tree_flatten(self):
        return (), (self.extrapolates,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del children
        return cls(extrapolate=aux[0])

    def __repr__(self):
        return f"Bilinear(extrapolate={self.extrapolates})"


@register_pytree_node_class
class BilinearPacked(Bilinear):
    """Finished bilinear strategy with the corner-row table precomputed at
    build time (one row gather per query, no per-call table assembly)."""

    def __init__(self, rows, extrapolate: bool = False):
        super().__init__(extrapolate)
        self.rows = rows

    def _rows(self):
        return self.rows

    def tree_flatten(self):
        return (self.rows,), (self.extrapolates,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], extrapolate=aux[0])

    def __repr__(self):
        return (
            f"BilinearPacked(rows={getattr(self.rows, 'shape', None)}, "
            f"extrapolate={self.extrapolates})"
        )
