"""Error taxonomy mirroring the reference crate.

Reference: ``/root/reference/src/lib.rs:126-146`` defines two error enums:

* ``BuilderError { NotEnoughData, Monotonic, ShapeError, ValueError }`` —
  raised while constructing an interpolator.
* ``InterpolateError::OutOfBounds`` — raised while evaluating.

We keep the same taxonomy as Python exception classes. Each variant is a
subclass so callers can catch either the broad category (``BuilderError``)
or the precise variant (``NotEnoughDataError``), matching Rust's
``matches!(err, BuilderError::NotEnoughData(_))`` test idiom
(`/root/reference/tests/interp1d.rs:123-140`).

Note on jit: these exceptions are raised on the *eager* paths only
(`interp`, `interp_array`, builder ``build()``).  The pure, jittable
evaluation core cannot raise value-dependent errors; it uses fill-value
semantics instead (see ``models.interp1d``).
"""

from __future__ import annotations


class BuilderError(Exception):
    """Errors during interpolator creation (``src/lib.rs:127-139``)."""


class NotEnoughDataError(BuilderError):
    """Insufficient data for the chosen interpolation strategy."""


class MonotonicError(BuilderError):
    """An interpolation axis is not strictly monotonic rising."""


class ShapeError(BuilderError):
    """Axis/data/boundary shape mismatch."""


class BuilderValueError(BuilderError):
    """Invalid value combination (e.g. periodic data with first != last)."""


class InterpolateError(Exception):
    """Errors during interpolation (``src/lib.rs:141-146``)."""


class OutOfBoundsError(InterpolateError):
    """A query point lies outside the knot range and extrapolation is off."""
