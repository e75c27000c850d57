"""Interval lookup ("bucketize") on a strictly-rising knot axis.

Reference: ``VectorExtensions::get_lower_index``
(``/root/reference/src/vector_extensions.rs:55-111``): returns the index of
the knot left of (or at) ``x``, never the last index, clamping to ``0`` /
``len-2`` when out of bounds so extrapolation can always use the first/last
interval.  The reference implements an O(1) even-spacing guess with a binary
search fallback per scalar query.

TPU-native shape: queries come as whole arrays, so the lookup is one
vectorized ``searchsorted`` over the batch.  XLA lowers this to a
branch-free binary search / comparison network; there is no benefit to the
reference's guess-then-verify trick because all lanes execute the same
instruction stream anyway.  The fused Pallas evaluation kernel
(``ops/pallas_eval.py``) instead computes the same quantity as a
sum-of-comparisons against a VMEM-resident knot vector.

Semantics pinned by the reference unit tests
(``src/vector_extensions.rs:221-302``):

* ``x <= knots[0]``  -> 0           (incl. ``-inf``)
* ``x >= knots[-1]`` -> ``n - 2``   (incl. ``+inf``)
* otherwise the unique ``i`` with ``knots[i] <= x < knots[i+1]``
* ``NaN``: the reference panics; our jit-safe lookup clamps NaN into the
  last interval, and the surrounding arithmetic then yields NaN output.
  Eager entry points raise instead (see driver code).
"""

from __future__ import annotations

import jax.numpy as jnp


# Below this knot count a fused compare-and-count beats binary search on
# TPU: the O(Q·n) comparison network is branch-free VPU work that XLA fuses
# without materializing the (Q, n) mask, while the O(Q·log n) binary search
# issues log(n) dependent dynamic-slices.  Measured on v5e with 1M queries:
# n=2048 compare_all 10.4 ms vs scan 86.9 ms.  On CPU the SAME choice is
# pathological — XLA:CPU executes the O(Q·n) compares for real (measured
# 12.2 s vs 33 ms for the unrolled binary search at n=2048 × 1M) — so the
# method is platform-dependent; every method returns identical indices.
_COMPARE_ALL_MAX_KNOTS = 16384


def get_lower_index(knots, xq):
    """Vectorized lower-interval index.

    Args:
      knots: (n,) strictly monotonically rising.
      xq: any shape; query positions.

    Returns:
      int32 array shaped like ``xq`` with values in ``[0, n-2]``.
    """
    import jax

    n = knots.shape[0]

    def _ss(method):
        def f(xq):
            idx = (
                jnp.searchsorted(
                    knots, xq, side="right", method=method
                ).astype(jnp.int32)
                - 1
            )
            return jnp.clip(idx, 0, n - 2)

        return f

    # the switch is scoped to the MEASURED platforms: TPU keeps
    # compare_all (wins there), CPU takes the unrolled binary search
    # (compare_all is 330x slower there); other backends (gpu, ...)
    # keep the pre-change n-based choice — unmeasured, unchanged
    default_method = "compare_all" if n <= _COMPARE_ALL_MAX_KNOTS else "scan"
    return jax.lax.platform_dependent(
        xq, cpu=_ss("scan_unrolled"), default=_ss(default_method)
    )


def is_in_range(knots, xq):
    """``knots[0] <= x <= knots[-1]`` elementwise (``src/interp1d/mod.rs:384-386``)."""
    return (knots[0] <= xq) & (xq <= knots[-1])


def lower_index_fast(knots, xq):
    """:func:`get_lower_index` with the two-level Pallas bucketize on TPU
    (selected at lowering time) for eligible f32 axes; identical results.

    ``xq`` must be flat (1-D)."""
    import jax

    from .. import config
    from .pallas_eval import _plan, fused_lower_index

    if (
        config.use_fused_kernel
        and xq.ndim == 1
        and xq.dtype == jnp.float32
        and knots.dtype == jnp.float32
        and knots.shape[0] >= 4
        and _plan(knots.shape[0]) is not None
    ):
        from .partition import sharded_lower_index

        return jax.lax.platform_dependent(
            xq,
            tpu=lambda q: sharded_lower_index()(knots, q),
            default=lambda q: get_lower_index(knots, q),
        )
    from .bigknots import MAX_BIG_KNOTS, big_lower_index_frac

    if (
        config.use_fused_kernel
        and xq.ndim == 1
        and xq.dtype == jnp.float32
        and knots.dtype == jnp.float32
        and 65536 < knots.shape[0] <= MAX_BIG_KNOTS
    ):
        # hierarchical search + one block gather: XLA's own large-n
        # searchsorted ("scan") issues log2(n) chained gathers
        return jax.lax.platform_dependent(
            xq,
            tpu=lambda q: big_lower_index_frac(knots, q)[0],
            default=lambda q: get_lower_index(knots, q),
        )
    return get_lower_index(knots, xq)
