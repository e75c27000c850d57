"""Shared linear-interpolation primitive.

Reference: ``Linear::calc_frac`` (``/root/reference/src/interp1d/strategies/linear.rs:29-37``)::

    b = y1;  m = (y2 - y1) / (x2 - x1);  m * (x - x1) + b

The exact operation order is preserved so f64 results match the reference
bit-for-bit (the reference tests use exact ``==`` comparisons, e.g.
``tests/interp1d.rs:20-30``).  The same helper is reused by the bilinear
strategy (``interp2d/strategies/bilinear.rs:88-97``) and by the even-spacing
index guess in the reference's searchsorted.

Integer dtypes: the reference is generic over ``Num`` and integer division
in Rust truncates toward zero; we use ``lax.div`` (C-style truncation) for
integer inputs to match (pinned by ``tests/interp1d.rs:15-18`` and the i32
corner tests in ``tests/interp2d.rs:26-34``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _div(a, b):
    if jnp.issubdtype(jnp.result_type(a), jnp.integer):
        return lax.div(a, b)
    return a / b


def calc_frac(x1, y1, x2, y2, x):
    """Linearly interpolate/extrapolate between two points (vectorized)."""
    b = y1
    m = _div(y2 - y1, x2 - x1)
    return m * (x - x1) + b
