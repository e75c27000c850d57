"""Bicubic (tensor-product cubic spline) interpolation on a rectilinear
grid — a beyond-reference strategy (the reference crate ships only
``Bilinear``; its README lists more interpolators as planned).

A tensor-product not-a-knot cubic spline through ``data[(nx, ny, ...)]``
is, piecewise, a bicubic Hermite patch whose corner state is the value
plus the three spline derivative grids:

* ``kx``  — d/dx knot derivatives: one batched 1-D spline solve along
  axis 0 (the same tridiagonal machinery as ``CubicSpline``,
  ``cubic.py:_solve_for_k``),
* ``ky``  — d/dy: the solve along axis 1,
* ``kxy`` — the cross derivative: the y-solve applied to ``kx``.

Evaluation at ``(x, y)`` is then three 1-D Hermite evaluations in the
same symmetric form as the 1-D kernel (``cubic_spline.rs:818-828``):
interpolate ``f`` and ``ky`` along x at both bracketing y-knots (using
``kx``/``kxy`` as their x-derivatives), then Hermite along y.  Agrees
with SciPy's ``RegularGridInterpolator(method="cubic")`` (tensor
not-a-knot) to oracle tolerance — see ``tests/test_bicubic.py``.

TPU shape: both bucketizes ride the Pallas search kernel via
``lower_index_fast``; the 16-corner state is packed into ONE gathered
row per query (the gather engine charges per row, not per byte — see
docs/ROADMAP.md) and the Hermite tail fuses into the gather consumer.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from .base2d import Interp2DStrategy, Interp2DStrategyBuilder
from .cubic import (
    _FIRST_DERIV,
    _NOT_A_KNOT,
    _SECOND_DERIV,
    _solve_for_k,
    _solve_periodic,
    _solve_periodic_core,
)

# per-axis boundary kinds (a subset of the 1-D families that is uniform
# along the axis — per-row mixing has no tensor-product analogue)
_AXIS_KINDS = {
    "not_a_knot": (_NOT_A_KNOT, 0.0),
    "natural": (_SECOND_DERIV, 0.0),
    "clamped": (_FIRST_DERIV, 0.0),
    "periodic": None,
}


def _solve_axis0(x, grid, bc, validate=False):
    """Spline derivative solve along axis 0 with a named boundary kind."""
    if bc == "periodic":
        return (_solve_periodic if validate else _solve_periodic_core)(
            x, grid
        )
    kind, val = _AXIS_KINDS[bc]
    return _solve_for_k(x, grid, kind, val, kind, val)


def _hermite(y_l, y_r, k_l, k_r, dx, t):
    """Value-derivative Hermite cubic in the symmetric reference form:
    a = k_l*dx - dy, b = -k_r*dx + dy (``cubic_spline.rs:350-367``)."""
    dy = y_r - y_l
    a = k_l * dx - dy
    b = dy - k_r * dx
    one = jnp.ones((), t.dtype)
    return (one - t) * y_l + t * y_r + t * (one - t) * (
        a * (one - t) + b * t
    )


def _solve_axis1(x, grid, bc="not_a_knot", validate=False):
    """Batched spline solve along axis 1 of (nx, ny, ...)."""
    moved = jnp.moveaxis(grid, 1, 0)  # (ny, nx, ...)
    k = _solve_axis0(x, moved, bc, validate=validate)
    return jnp.moveaxis(k, 0, 1)


def pack_bicubic_rows(x, y, data, kx, ky, kxy):
    """Per-cell rows: the 16-value corner state (4 quantities x 4
    corners, trailing-flattened) + the 4 interval endpoints — everything
    one query needs in ONE gathered row (cf. ``bilinear.pack_corner_rows``)."""
    nx, ny = data.shape[0], data.shape[1]
    r = 1
    for s in data.shape[2:]:
        r *= s
    blocks = []
    for g in (data, kx, ky, kxy):
        blocks.append(
            jnp.stack(
                [g[:-1, :-1], g[:-1, 1:], g[1:, :-1], g[1:, 1:]], axis=2
            ).reshape(nx - 1, ny - 1, 4 * r)
        )
    ends = jnp.stack(
        [
            jnp.broadcast_to(x[:-1, None], (nx - 1, ny - 1)),
            jnp.broadcast_to(x[1:, None], (nx - 1, ny - 1)),
            jnp.broadcast_to(y[None, :-1], (nx - 1, ny - 1)),
            jnp.broadcast_to(y[None, 1:], (nx - 1, ny - 1)),
        ],
        axis=-1,
    ).astype(data.dtype)
    return jnp.concatenate(blocks + [ends], axis=-1).reshape(
        (nx - 1) * (ny - 1), 16 * r + 4
    )


@register_pytree_node_class
class Bicubic(Interp2DStrategy, Interp2DStrategyBuilder):
    """Tensor-product cubic spline (builder form).

    Chainable configuration like the other strategies::

        Bicubic()                                # NAK, no extrapolation
        Bicubic().extrapolate(True)
        Bicubic().boundary("natural", "clamped")  # per-axis families
        Bicubic().boundary("periodic", "not_a_knot")

    Per-axis boundary kinds: ``not_a_knot`` (default), ``natural``,
    ``clamped``, ``periodic`` (requires ``data[0] == data[-1]`` along
    that axis; queries wrap on it, mirroring the 1-D
    ``Extrapolate::Periodic`` contract ``cubic_spline.rs:804-809``).
    """

    MINIMUM_DATA_LENGTH = 3  # cubic needs 3 knots per axis (NAK parabola)

    def __init__(
        self,
        extrapolate: bool = False,
        bc_x: str = "not_a_knot",
        bc_y: str = "not_a_knot",
    ):
        for bc in (bc_x, bc_y):
            if bc not in _AXIS_KINDS:
                raise ValueError(
                    f"unknown bicubic boundary kind {bc!r}; choose from "
                    f"{sorted(_AXIS_KINDS)}"
                )
        self.extrapolates = bool(extrapolate)
        self.bc_x = bc_x
        self.bc_y = bc_y

    def extrapolate(self, yes: bool = True) -> "Bicubic":
        return Bicubic(extrapolate=yes, bc_x=self.bc_x, bc_y=self.bc_y)

    def boundary(self, bc_x: str, bc_y: str = None) -> "Bicubic":
        """Per-axis boundary families (``bc_y`` defaults to ``bc_x``)."""
        return Bicubic(
            extrapolate=self.extrapolates,
            bc_x=bc_x,
            bc_y=bc_x if bc_y is None else bc_y,
        )

    def build(self, x, y, data):
        # periodic axes validate data[0] == data[-1] eagerly (the check is
        # data-dependent, so jit builds skip it — new_unchecked semantics)
        kx = _solve_axis0(x, data, self.bc_x, validate=True)
        ky = _solve_axis1(y, data, self.bc_y, validate=True)
        # cross derivative: the y-solve applied to kx.  For periodic y the
        # kx columns inherit data's first==last equality, so the same
        # solve applies (validation already ran on data itself).
        kxy = _solve_axis1(y, kx, self.bc_y)
        return BicubicStrategy(
            pack_bicubic_rows(x, y, data, kx, ky, kxy),
            self.extrapolates,
            bc_x=self.bc_x,
            bc_y=self.bc_y,
        )

    def eval(self, interp, xq, yq):  # pragma: no cover - builder never eval'd
        return self.build(interp.x, interp.y, interp.data).eval(
            interp, xq, yq
        )

    def tree_flatten(self):
        return (), (self.extrapolates, self.bc_x, self.bc_y)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del children
        return cls(extrapolate=aux[0], bc_x=aux[1], bc_y=aux[2])

    def __repr__(self):
        return (
            f"Bicubic(extrapolate={self.extrapolates}, "
            f"bc_x={self.bc_x!r}, bc_y={self.bc_y!r})"
        )


@register_pytree_node_class
class BicubicStrategy(Interp2DStrategy):
    """Finished bicubic strategy: packed per-cell corner-state rows."""

    MINIMUM_DATA_LENGTH = 3

    def __init__(
        self,
        rows,
        extrapolate: bool = False,
        bc_x: str = "not_a_knot",
        bc_y: str = "not_a_knot",
    ):
        self.rows = rows
        self.extrapolates = bool(extrapolate)
        self.bc_x = bc_x
        self.bc_y = bc_y

    @property
    def wraps_x(self):
        """Queries wrap (rem_euclid) on a periodic x axis — never OOB."""
        return self.bc_x == "periodic"

    @property
    def wraps_y(self):
        return self.bc_y == "periodic"

    def eval(self, interp, xq, yq):
        from ...ops.searchsorted import lower_index_fast

        x, y, data = interp.x, interp.y, interp.data
        if self.wraps_x:  # rem_euclid wrap, cubic_spline.rs:804-809
            xq = jnp.mod(xq - x[0], x[-1] - x[0]) + x[0]
        if self.wraps_y:
            yq = jnp.mod(yq - y[0], y[-1] - y[0]) + y[0]
        ny = data.shape[1]
        trailing = data.shape[2:]
        r = 1
        for s in trailing:
            r *= s
        xi = lower_index_fast(x, xq)
        yi = lower_index_fast(y, yq)
        g = jnp.take(self.rows, xi * (ny - 1) + yi, axis=0)  # (Q, 16r+4)

        out_shape = xq.shape + trailing

        def block(i):  # corner quantity i, corners [11, 12, 21, 22]
            base = 4 * r * i
            return (
                g[:, base + 0 * r : base + 1 * r].reshape(out_shape),
                g[:, base + 1 * r : base + 2 * r].reshape(out_shape),
                g[:, base + 2 * r : base + 3 * r].reshape(out_shape),
                g[:, base + 3 * r : base + 4 * r].reshape(out_shape),
            )

        f11, f12, f21, f22 = block(0)
        kx11, kx12, kx21, kx22 = block(1)
        ky11, ky12, ky21, ky22 = block(2)
        kxy11, kxy12, kxy21, kxy22 = block(3)
        expand = xq.shape + (1,) * len(trailing)
        x1 = g[:, 16 * r + 0].reshape(expand)
        x2 = g[:, 16 * r + 1].reshape(expand)
        y1 = g[:, 16 * r + 2].reshape(expand)
        y2 = g[:, 16 * r + 3].reshape(expand)

        dx = x2 - x1
        dy = y2 - y1
        tx = (xq.reshape(expand) - x1) / dx
        ty = (yq.reshape(expand) - y1) / dy
        # interpolate f and ky along x at both bracketing y-knots (kx and
        # kxy supply their x-derivatives), then Hermite along y
        f_y1 = _hermite(f11, f21, kx11, kx21, dx, tx)
        f_y2 = _hermite(f12, f22, kx12, kx22, dx, tx)
        ky_y1 = _hermite(ky11, ky21, kxy11, kxy21, dx, tx)
        ky_y2 = _hermite(ky12, ky22, kxy12, kxy22, dx, tx)
        return _hermite(f_y1, f_y2, ky_y1, ky_y2, dy, ty)

    def tree_flatten(self):
        return (self.rows,), (self.extrapolates, self.bc_x, self.bc_y)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            children[0], extrapolate=aux[0], bc_x=aux[1], bc_y=aux[2]
        )

    def __repr__(self):
        return (
            f"BicubicStrategy(rows={getattr(self.rows, 'shape', None)}, "
            f"extrapolate={self.extrapolates}, bc_x={self.bc_x!r}, "
            f"bc_y={self.bc_y!r})"
        )
