"""Row gather along axis 0, TPU-shaped.

XLA's gather on TPU degrades badly for banked tables: fetching 4k interval
rows from a (255, 16384) coefficient bank measured ~640 ms on v5e — ~500×
off the HBM floor.  For moderate knot counts the gather is better spent on
the MXU as a one-hot matmul (selection by exact 0/1 weights), which is how
TPUs want to move scattered rows.

``gather_rows`` picks the formulation statically:

* one-hot matmul when the table's row count is small enough and the bank
  (trailing size) is wide enough for matmul to win,
* plain ``take`` otherwise.

The one-hot path chunks the query axis so the (Q, n) selection mask never
exceeds a VMEM-friendly footprint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# use the MXU when the bank is at least this wide
_MIN_BANK = 8
# and the knot axis is at most this long (one-hot cost is O(n) per query)
_MAX_ROWS = 8192
# cap the materialized one-hot at ~32M elements (128 MB f32)
_MAX_OH_ELEMS = 32 * 1024 * 1024


def _onehot_gather(table2, idx):
    """table2 (n, r), idx (Q,) → (Q, r) via one-hot matmul.

    HIGHEST precision keeps selection exact for f32 tables.  (An exact
    3-way bf16 split — see ``pallas_eval._split3`` — halves the MXU passes
    inside the fused Pallas kernel, but measured 2.4× *slower* here: in
    XLA the split terms either materialize (Q, r)-sized partial products
    in HBM or widen the one-hot to 3n lanes, both of which cost more than
    the extra MXU passes on wide banks.)"""
    n = table2.shape[0]

    def chunk(ic):
        oh = (
            ic[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        ).astype(table2.dtype)
        return jnp.dot(
            oh,
            table2,
            preferred_element_type=table2.dtype,
            precision=lax.Precision.HIGHEST,
        )

    q = idx.shape[0]
    max_chunk = max(1, _MAX_OH_ELEMS // max(n, 1))
    if q <= max_chunk:
        return chunk(idx)
    # pad to a multiple and map over chunks
    nchunk = -(-q // max_chunk)
    pad = nchunk * max_chunk - q
    idx_p = jnp.pad(idx, (0, pad)).reshape(nchunk, max_chunk)
    out = lax.map(chunk, idx_p)
    return out.reshape(nchunk * max_chunk, -1)[:q]


def gather_rows(table, idx, assume_finite=True):
    """``table[idx]`` along axis 0; table (n, *trailing), idx (Q,).

    ``assume_finite=False`` forces the ``take`` formulation: the one-hot
    matmul computes ``sum(onehot * row)`` over ALL rows, so a non-finite
    value anywhere in the table would poison every query (``NaN * 0 ==
    NaN`` on the MXU) — see docs/PARITY.md D5.
    """
    n = table.shape[0]
    trailing = table.shape[1:]
    r = 1
    for s in trailing:
        r *= s

    table2 = table.reshape(n, r)

    def take_branch(table2, idx):
        # XLA's TPU gather degrades ~7x on >2-D operands; already flattened
        return jnp.take(table2, idx, axis=0)

    eligible = (
        assume_finite
        and r >= _MIN_BANK
        and n <= _MAX_ROWS
        and jnp.issubdtype(table.dtype, jnp.floating)
        # the (Q, n) one-hot mask must stay single-chunk: for large query
        # counts the chunked mask materialization costs more HBM traffic
        # than the row gather it replaces
        and idx.shape[0] * n <= _MAX_OH_ELEMS
    )
    if eligible:
        # MXU one-hot gather only when lowering for TPU
        out = jax.lax.platform_dependent(
            table2, idx, tpu=_onehot_gather, default=take_branch
        )
    else:
        out = take_branch(table2, idx)
    return out.reshape(idx.shape + trailing)
