"""Public axis utilities (mirrors ``ndarray_interp::vector_extensions``).

Reference: ``/root/reference/src/vector_extensions.rs`` exposes
``VectorExtensions { monotonic_prop, get_lower_index }`` as a public
module.  The JAX build exposes the same two operations as functions:

* :func:`monotonic_prop` — host-side classification (build-time check),
* :func:`get_lower_index` — vectorized, jittable interval lookup,
* :func:`is_in_range` — range predicate used by the OOB checks.
"""

from .ops.searchsorted import get_lower_index, is_in_range
from .utils.monotonic import Monotonic, MonotonicKind, monotonic_prop

__all__ = [
    "get_lower_index",
    "is_in_range",
    "Monotonic",
    "MonotonicKind",
    "monotonic_prop",
]
