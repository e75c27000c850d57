"""Ergonomic aliases for common interpolator configurations.

Reference: ``/root/reference/src/interp1d/aliases.rs``.  The Rust aliases
encode storage representation (owned vs view) and dimensionality in the
type system (``Interp1DOwned/View/DataView/Scalar/Vec``).  JAX arrays are
always immutable device buffers — the owned/view distinction has no
analogue — so these are documentation-level aliases kept for API parity:
all of them *are* :class:`Interp1D`; the names state intent
(scalar-valued vs vector-valued data).
"""

from ..models.interp1d import Interp1D

#: interpolant over owned data (every JAX interpolant owns its buffers)
Interp1DOwned = Interp1D
#: interpolant over array views (JAX arrays are immutable; identical)
Interp1DView = Interp1D
#: interpolant with viewed data but owned axis
Interp1DDataView = Interp1D
#: interpolant of scalar-valued data (data ndim == 1)
Interp1DScalar = Interp1D
#: interpolant of vector-valued data (data ndim == 2)
Interp1DVec = Interp1D

__all__ = [
    "Interp1DOwned",
    "Interp1DView",
    "Interp1DDataView",
    "Interp1DScalar",
    "Interp1DVec",
]
