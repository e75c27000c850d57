"""Public N-D interpolation API (beyond the reference, which stops at
2-D — ``/root/reference/src/interp2d/mod.rs:29-32``).  SciPy
``RegularGridInterpolator`` surface over the leading ``k`` axes."""

from ..models.interpnd import InterpND, InterpNDBuilder

__all__ = ["InterpND", "InterpNDBuilder"]
