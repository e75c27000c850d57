"""Ergonomic aliases for common 2-D interpolator configurations.

Reference: ``/root/reference/src/interp2d/aliases.rs``.  See
``interp1d/aliases.py`` for why these are documentation-level in JAX.
"""

from ..models.interp2d import Interp2D

Interp2DOwned = Interp2D
Interp2DView = Interp2D
Interp2DDataView = Interp2D
#: interpolant of scalar-valued data (data ndim == 2)
Interp2DScalar = Interp2D
#: interpolant of vector-valued data (data ndim == 3)
Interp2DVec = Interp2D

__all__ = [
    "Interp2DOwned",
    "Interp2DView",
    "Interp2DDataView",
    "Interp2DScalar",
    "Interp2DVec",
]
