"""Step-family interpolation strategies: nearest / previous / next.

The reference crate's extension-point demo is exactly this interpolator
(``/root/reference/examples/custom_strategy.rs``), and its README lists
"more interpolation strategies" as planned — this ships the family
first-class.  Modes mirror SciPy's ``interp1d`` kinds (the oracle in
``tests/test_strategies.py``):

* ``"nearest"``      — closest knot, midpoint ties to the LEFT knot,
* ``"nearest-up"``   — closest knot, midpoint ties to the RIGHT knot
  (the reference example's semantics, ``custom_strategy.rs:38-53``),
* ``"previous"``     — the knot at or before the query,
* ``"next"``         — the knot at or after the query.

Out-of-range queries follow the crate-wide contract: error eagerly /
NaN under jit unless ``.extrapolate(True)``, in which case the step
family clamps to the end values (constant extrapolation — the natural
step-function limit; SciPy instead fills NaN).  NOTE the jit NaN mask
applies to inexact outputs only (the driver contract,
``models/interp1d.py::__call__``): INTEGER data — which this family
keeps exact — cannot hold NaN, so under jit an out-of-range query on
integer data returns the clamped end value even without extrapolate;
use the eager API or ``eval_checked`` where integer OOB must error.

Selection is one ``get_lower_index`` pass + an index pick — no
arithmetic on data values, so integer data stays exact.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from .base import Interp1DStrategy, Interp1DStrategyBuilder
from .base2d import Interp2DStrategy, Interp2DStrategyBuilder

_MODES = ("nearest", "nearest-up", "previous", "next")


@register_pytree_node_class
class Nearest(Interp1DStrategy, Interp1DStrategyBuilder):
    """Step interpolation; see module docstring for the mode semantics."""

    MINIMUM_DATA_LENGTH = 2

    def __init__(self, mode: str = "nearest", extrapolate: bool = False):
        if mode not in _MODES:
            raise ValueError(
                f"unknown step mode {mode!r}; choose from {_MODES}"
            )
        self.mode = mode
        self.extrapolates = bool(extrapolate)

    def extrapolate(self, yes: bool = True) -> "Nearest":
        return Nearest(mode=self.mode, extrapolate=yes)

    def build(self, x, data):
        return self

    def eval(self, interp, xq):
        idx = interp.get_index_left_of(xq)  # clamped to [0, n-2]
        x_l = interp.x[idx]
        x_r = interp.x[idx + 1]
        if self.mode == "nearest":
            pick = jnp.where((xq - x_l) <= (x_r - xq), idx, idx + 1)
        elif self.mode == "nearest-up":
            pick = jnp.where((xq - x_l) < (x_r - xq), idx, idx + 1)
        elif self.mode == "previous":
            # the knot at or before xq; idx+1 only when xq has reached
            # x_r (exact right-endpoint hit of the clamped last interval)
            pick = jnp.where(xq >= x_r, idx + 1, idx)
        else:  # "next"
            pick = jnp.where(xq > x_l, idx + 1, idx)
        return jnp.take(interp.data, pick, axis=0)

    def tree_flatten(self):
        return (), (self.mode, self.extrapolates)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del children
        return cls(mode=aux[0], extrapolate=aux[1])

    def __repr__(self):
        return f"Nearest(mode={self.mode!r}, extrapolate={self.extrapolates})"


@register_pytree_node_class
class Nearest2D(Interp2DStrategy, Interp2DStrategyBuilder):
    """Nearest-grid-node interpolation on a rectilinear grid (the 2-D
    member of the step family; oracle: SciPy's
    ``RegularGridInterpolator(method="nearest")``).

    Per-axis midpoint ties go to the LEFT knot (the 1-D ``"nearest"``
    rule).  Out-of-range queries error eagerly / NaN under jit unless
    ``.extrapolate(True)``, which clamps to the border nodes (jit NaN
    masking is inexact-dtypes-only — integer grids clamp under jit; see
    the module docstring).  One ``get_lower_index`` pass per axis + a
    single node gather — integer data stays exact."""

    MINIMUM_DATA_LENGTH = 2

    def __init__(self, extrapolate: bool = False):
        self.extrapolates = bool(extrapolate)

    def extrapolate(self, yes: bool = True) -> "Nearest2D":
        return Nearest2D(extrapolate=yes)

    def build(self, x, y, data):
        return self

    def eval(self, interp, xq, yq):
        x, y, data = interp.x, interp.y, interp.data
        xi, yi = interp.get_index_left_of(xq, yq)
        px = jnp.where((xq - x[xi]) <= (x[xi + 1] - xq), xi, xi + 1)
        py = jnp.where((yq - y[yi]) <= (y[yi + 1] - yq), yi, yi + 1)
        ny = data.shape[1]
        flat = data.reshape((-1,) + data.shape[2:])
        return jnp.take(flat, px * ny + py, axis=0)

    def tree_flatten(self):
        return (), (self.extrapolates,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del children
        return cls(extrapolate=aux[0])

    def __repr__(self):
        return f"Nearest2D(extrapolate={self.extrapolates})"
