"""Cubic-spline strategy public API.

Mirrors ``ndarray_interp::interp1d::cubic_spline``
(``/root/reference/src/interp1d/strategies/cubic_spline.rs``).
"""

from ..models.strategies.cubic import (
    BoundaryCondition,
    CubicSpline,
    CubicSplineStrategy,
    RowBoundary,
    SingleBoundary,
)

__all__ = [
    "BoundaryCondition",
    "CubicSpline",
    "CubicSplineStrategy",
    "RowBoundary",
    "SingleBoundary",
]
