"""N-dimensional rectilinear-grid interpolation (beyond the reference).

The reference crate stops at two interpolated axes
(``/root/reference/src/interp2d/mod.rs:29-32``); this module covers the
leading-``k``-axes case with the SciPy ``RegularGridInterpolator``
surface (methods ``"linear"`` and ``"nearest"``) so its users can
switch.  The driver conventions carry over from the 1-D/2-D drivers:
query dims leading with output dims ``M + N - k``
(``mod.rs:175-211``), matching query shapes enforced, OOB raises
eagerly / masks to NaN in the pure jittable path (docs/PARITY.md D1),
extrapolation extends the edge cells.

TPU-native design: per-axis clamped bucketize (the fused Pallas
``(idx, t)`` pass on TPU, the shared searchsorted op elsewhere), then
ONE row gather per query: the builder packs a per-cell corner table
(all ``2^k`` corner blocks contiguous per cell, the
:class:`BilinearPacked` idiom generalized), so evaluation is a single
``jnp.take`` of ``2^k·r``-channel rows plus a multiplicative-weight
full reduce — the shape XLA fuses into the gather (docs/ROADMAP.md,
gather-fusion boundary).  Grids whose table would exceed
``config.interpnd_pack_max_elems`` (the table is ``2^k``× the data's
memory) fall back to the unpacked ``2^k``-corner gather.  Everything is
static-shape, jittable, and vmappable; queries shard trivially over a
mesh (each query touches only its own cell).
"""

from __future__ import annotations

import itertools

import numpy as np

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from ..errors import (
    MonotonicError,
    NotEnoughDataError,
    OutOfBoundsError,
    ShapeError,
)
from ..ops.searchsorted import is_in_range
from ..utils.monotonic import monotonic_prop
from .interp1d import _host_view, _is_traced
from .strategies.bicubic import _index_frac

_METHODS = ("linear", "nearest")


def pack_corner_rows_nd(data, k):
    """Per-cell packed rows: the ``2^k`` corner blocks of each cell laid
    out contiguously (corner-major, each block ``r = prod(trailing)``
    channels, in :func:`itertools.product` corner order — the weight
    order of the eval).  One row gather then feeds the whole
    multilinear blend; the :func:`~..strategies.bilinear.pack_corner_rows`
    idiom generalized to ``k`` axes (no endpoint channels — ``t`` comes
    from the bucketize pass)."""
    grid = data.shape[:k]
    trailing = data.shape[k:]
    r = 1
    for s in trailing:
        r *= s
    cells = tuple(n - 1 for n in grid)
    ncells = 1
    for c in cells:
        ncells *= c
    blocks = [
        data[
            tuple(slice(1, None) if d else slice(None, -1) for d in c)
        ].reshape(cells + (r,))
        for c in itertools.product((0, 1), repeat=k)
    ]
    table = jnp.stack(blocks, axis=k)  # cells + (2^k, r)
    return table.reshape(ncells, (2**k) * r)


def _corner_weights(ts, k):
    """(Q, 2^k) multilinear weights in ``itertools.product`` corner
    order (matches :func:`pack_corner_rows_nd`'s block order)."""
    one = jnp.ones((), ts[0].dtype)
    w = []
    for c in itertools.product((0, 1), repeat=k):
        wc = one
        for d, t in zip(c, ts):
            wc = wc * (t if d else one - t)
        w.append(wc)
    return jnp.stack(w, axis=-1)


def _eval_core(interp, flats):
    """Evaluate at flat query vectors (one per interpolated axis)."""
    axes = interp.axes
    data = interp.data
    k = len(axes)
    grid = data.shape[:k]
    trailing = data.shape[k:]

    idx = []
    ts = []
    for ax, q in zip(axes, flats):
        i, t = _index_frac(ax, q)  # i clamped to [0, n-2]
        idx.append(i)
        ts.append(t)

    if interp.method == "nearest":
        # per-axis nearest node, ties toward the lower node (the step
        # family's "nearest" convention); the clamped interval makes
        # out-of-range queries pick the edge node
        strides = [1] * k
        for d in range(k - 2, -1, -1):
            strides[d] = strides[d + 1] * grid[d + 1]
        flat = sum(
            jnp.where(t <= 0.5, i, i + 1) * s
            for i, t, s in zip(idx, ts, strides)
        )
        return jnp.take(data.reshape((-1,) + trailing), flat, axis=0)

    w = _corner_weights(ts, k)  # (Q, 2^k)

    if interp.table is not None:
        # packed route: ONE row gather + a full-channel weighted reduce
        # (the shape XLA fuses into the gather; r>1 pays one re-stream)
        cstrides = [1] * k
        for d in range(k - 2, -1, -1):
            cstrides[d] = cstrides[d + 1] * (grid[d + 1] - 1)
        cell = sum(i * s for i, s in zip(idx, cstrides))
        r = 1
        for s in trailing:
            r *= s
        rows = jnp.take(interp.table, cell, axis=0)  # (Q, 2^k * r)
        rows = rows.reshape(rows.shape[0], 2**k, r)
        out = jnp.sum(rows * w[:, :, None], axis=1)
        return out.reshape(out.shape[:1] + trailing)

    # unpacked route: 2^k corner rows via one flat multi-index gather
    strides = [1] * k
    for d in range(k - 2, -1, -1):
        strides[d] = strides[d + 1] * grid[d + 1]
    base = sum(i * s for i, s in zip(idx, strides))  # (Q,)
    offsets = jnp.asarray(
        [
            sum(d * s for d, s in zip(c, strides))
            for c in itertools.product((0, 1), repeat=k)
        ],
        dtype=base.dtype,
    )
    g = jnp.take(
        data.reshape((-1,) + trailing), base[:, None] + offsets[None, :],
        axis=0,
    )
    expand = w.shape + (1,) * len(trailing)
    return jnp.sum(g * w.reshape(expand), axis=1)


@jax.jit
def _eval_flat(interp, *flats):
    flats = tuple(
        f.astype(interp.axes[d].dtype) for d, f in enumerate(flats)
    )
    return _eval_core(interp, flats)


@jax.jit
def _eval_flat_masked(interp, *flats):
    flats = tuple(
        f.astype(interp.axes[d].dtype) for d, f in enumerate(flats)
    )
    out = _eval_core(interp, flats)
    if not interp.extrapolates and jnp.issubdtype(out.dtype, jnp.inexact):
        ok = jnp.ones(flats[0].shape, bool)
        for ax, q in zip(interp.axes, flats):
            ok = ok & is_in_range(ax, q)
        out = jnp.where(
            ok.reshape(ok.shape + (1,) * (out.ndim - 1)), out, jnp.nan
        )
    return out


@register_pytree_node_class
class InterpND:
    """Interpolator over the leading ``k`` axes of ``data`` (pytree).

    Construct via :meth:`builder` (validating) or :meth:`new_unchecked`.
    ``method``: ``"linear"`` (multilinear, ``2^k``-corner cell blend) or
    ``"nearest"`` (nearest grid node, per-axis ties toward the lower
    node, extrapolation clamps).
    """

    def __init__(
        self, axes, data, method="linear", extrapolate=False, table=None
    ):
        self.axes = tuple(axes)
        self.data = data
        self.method = method
        self.extrapolates = bool(extrapolate)
        self.table = table

    @property
    def k(self) -> int:
        return len(self.axes)

    # -- construction ----------------------------------------------------------
    @classmethod
    def builder(cls, data) -> "InterpNDBuilder":
        return InterpNDBuilder(data)

    @classmethod
    def new_unchecked(
        cls, axes, data, method="linear", extrapolate=False, table=None
    ) -> "InterpND":
        """No-validation constructor (pytree unflatten).  ``table`` is
        the optional packed corner-row table (derived state); pass
        :meth:`packed` output or leave ``None`` for the unpacked
        gather route."""
        return cls(axes, data, method, extrapolate, table)

    @staticmethod
    def _pack_or_none(data, k, method):
        """The packed corner table when the route is eligible: linear
        method, floating data, table (``2^k``× the data's memory) under
        ``config.interpnd_pack_max_elems``."""
        from .. import config

        if method != "linear":
            return None
        if not jnp.issubdtype(data.dtype, jnp.floating):
            return None
        if data.size * (2**k) > config.interpnd_pack_max_elems:
            return None
        return pack_corner_rows_nd(data, k)

    # -- pure, jittable core -----------------------------------------------------
    def __call__(self, *coords):
        """Evaluate at ``k`` coordinate arrays of one common shape.
        Pure/jittable; out-of-range → NaN when not extrapolating."""
        coords = self._as_query(coords)
        out = _eval_flat_masked(self, *(c.reshape(-1) for c in coords))
        return out.reshape(coords[0].shape + self.data.shape[self.k :])

    def eval_unchecked(self, *coords):
        """Pure eval with no OOB mask (edge-cell extrapolation)."""
        coords = self._as_query(coords)
        out = _eval_flat(self, *(c.reshape(-1) for c in coords))
        return out.reshape(coords[0].shape + self.data.shape[self.k :])

    # -- eager API ---------------------------------------------------------------
    def interp(self, *coords):
        """Eager scalar-point eval → ``data.shape[k:]`` array; raises
        ``OutOfBoundsError`` per axis unless extrapolating."""
        arrs = tuple(jnp.asarray(c) for c in coords)
        self._check_arity(arrs)
        if not any(_is_traced(c) for c in arrs):
            self._check_queries([c.reshape(-1) for c in arrs])
        return self.eval_unchecked(*arrs).reshape(self.data.shape[self.k :])

    def interp_array(self, *coords):
        """Batched eval; output dims ``M + N - k`` with query dims
        leading; all coordinate arrays must share one shape."""
        coords = self._as_query(coords)
        if not any(_is_traced(c) for c in coords):
            self._check_queries([c.reshape(-1) for c in coords])
        return self.eval_unchecked(*coords)

    def get_buffer_shape(self, query_shape) -> tuple:
        return tuple(query_shape) + tuple(self.data.shape[self.k :])

    # -- internals ---------------------------------------------------------------
    def _check_arity(self, coords):
        if len(coords) != self.k:
            raise ValueError(
                f"expected {self.k} coordinate arrays (one per "
                f"interpolated axis), got {len(coords)}"
            )

    def _as_query(self, coords):
        coords = tuple(jnp.asarray(c) for c in coords)
        self._check_arity(coords)
        shape = coords[0].shape
        if any(c.shape != shape for c in coords[1:]):
            raise ValueError("query coordinate shapes do not match")
        return coords

    def _range_host(self):
        cached = getattr(self, "_range_cache", None)
        if cached is None:
            cached = tuple(
                (float(ax[0]), float(ax[-1])) for ax in self.axes
            )
            self._range_cache = cached
        return cached

    def _check_queries(self, flats):
        for d, q in enumerate(flats):
            qh = np.asarray(q)
            if np.issubdtype(qh.dtype, np.floating) and np.isnan(qh).any():
                raise ValueError("failed to convert NaN to an index")
        if self.extrapolates:
            return
        ranges = self._range_host()
        for d, (q, (lo, hi)) in enumerate(zip(flats, ranges)):
            qh = np.asarray(q)
            ok = (lo <= qh) & (qh <= hi)
            if not ok.all():
                bad = qh[~ok][0] if qh.ndim else qh
                raise OutOfBoundsError(
                    f"axis {d}: {bad} is not in range"
                )

    # -- pytree --------------------------------------------------------------
    def tree_flatten(self):
        return (self.axes, self.data, self.table), (
            self.method,
            self.extrapolates,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1], children[2])

    def __repr__(self):
        packed = ", packed" if self.table is not None else ""
        return (
            f"InterpND(k={self.k}, data={self.data.shape}, "
            f"method={self.method!r}, extrapolate={self.extrapolates}"
            f"{packed})"
        )


class InterpNDBuilder:
    """Create and configure an :class:`InterpND`.

    Defaults mirror the 1-D/2-D builders: axes default to indices over
    ALL data dims (``k = data.ndim``, the ``RegularGridInterpolator``
    convention), method ``"linear"``, no extrapolation.  ``.points``
    sets the axis vectors (their count fixes ``k``; trailing data dims
    are vectorized like the reference's trailing axes).
    """

    def __init__(self, data):
        self._data = jnp.asarray(data)
        self._points = None
        self._points_host = None
        self._method = "linear"
        self._extrapolate = False

    def points(self, *axes) -> "InterpNDBuilder":
        self._points_host = tuple(_host_view(ax) for ax in axes)
        self._points = tuple(jnp.asarray(ax) for ax in axes)
        return self

    def method(self, method: str) -> "InterpNDBuilder":
        if method not in _METHODS:
            raise ValueError(
                f"unknown InterpND method {method!r}; choose from "
                f"{sorted(_METHODS)}"
            )
        self._method = method
        return self

    def extrapolate(self, yes: bool = True) -> "InterpNDBuilder":
        self._extrapolate = bool(yes)
        return self

    def build(self) -> InterpND:
        """Validation mirrors the 2-D builder per axis
        (``mod.rs:468-518``): enough data, axis/data length match,
        strict monotonic rise."""
        data = self._data
        axes = self._points
        if axes is None:
            axes = tuple(
                jnp.arange(n, dtype=data.dtype) for n in data.shape
            )
            self._points_host = tuple(
                np.arange(n, dtype=np.dtype(data.dtype))
                for n in data.shape
            )
        k = len(axes)
        if k == 0:
            raise ShapeError("at least one axis is required")
        if data.ndim < k:
            raise ShapeError(f"data dimension needs to be at least {k}")
        for d, ax in enumerate(axes):
            if ax.ndim != 1:
                raise ShapeError(f"axis {d} must be one-dimensional")
            if data.shape[d] < 2:
                raise NotEnoughDataError(
                    f"The {d}-dimension has not enough data for the "
                    f"chosen interpolation strategy. Provided: "
                    f"{data.shape[d]}, Required: 2"
                )
            if ax.shape[0] != data.shape[d]:
                raise ShapeError(
                    f"Lengths of axis {d} and data-{d}-axis need to "
                    f"match. Got axis: {ax.shape[0]}, data-{d}: "
                    f"{data.shape[d]}"
                )
            host = (
                self._points_host[d]
                if self._points_host and self._points_host[d] is not None
                else np.asarray(ax)
            )
            if not monotonic_prop(host).is_strict_rising:
                raise MonotonicError(
                    f"axis {d} needs to be strictly monotonic rising"
                )
        ct = jnp.result_type(data.dtype, *(ax.dtype for ax in axes))
        if not jnp.issubdtype(ct, jnp.inexact):
            ct = jnp.result_type(ct, jnp.float32)
        axes_ct = tuple(ax.astype(ct) for ax in axes)
        data_ct = data.astype(ct)
        return InterpND(
            axes_ct,
            data_ct,
            self._method,
            self._extrapolate,
            InterpND._pack_or_none(data_ct, k, self._method),
        )
