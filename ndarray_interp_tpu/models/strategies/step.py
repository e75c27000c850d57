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
step-function limit; SciPy instead fills NaN).

Selection is one ``get_lower_index`` pass + an index pick — no
arithmetic on data values, so integer data stays exact.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from .base import Interp1DStrategy, Interp1DStrategyBuilder

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
