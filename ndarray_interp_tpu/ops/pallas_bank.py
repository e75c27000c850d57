"""Fused banked evaluation kernel: one-hot select + Hermite, in VMEM.

Banked cubic/Hermite evaluation (one knot axis, a wide bank of splines
sharing it — ``cubic_spline.rs:791-830`` vectorized over trailing axes)
was gather-bound in XLA: the one-hot row gather ran at HIGHEST precision
(six MXU passes) and materialized a 4-channel (Q, bank) intermediate in
HBM before the polynomial tail streamed it again (~4.5 ms for a 4k-query
16k-spline bank on v5e).

This kernel does the selection with exact 3-way bf16 truncation splits
(see ``pallas_eval._split3`` — bit-identical to f32 at half the passes)
computed IN VMEM from directly-streamed f32 table tiles, and evaluates
the Hermite form on the selected channels while they are still
VMEM-resident, writing only the final (Q, bank) result at its exact
shape.  The grid iterates bank tiles in the outer dimension so each
table tile is DMA'd once and reused across all query tiles.

The per-query interval index and fraction t are computed in XLA first
(they are shared across the whole bank row and cost O(Q)); the one-hot
matrix is exactly representable in bf16, so channel selection — and
therefore the whole result — is bit-identical to the gather formulation
in ``CubicSplineStrategy._eval_xla`` **for finite table values**.  A
NaN/inf datum poisons its entire bank lane for all queries (``NaN * 0 ==
NaN`` on the MXU); non-finite banks are routed to the gather path via
the strategy's ``finite`` hint (docs/PARITY.md D5).

Gradients: ``custom_vjp`` whose backward pass is the VJP of the gather
formulation, like ``fused_eval_1d``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_eval import _split3

# eligibility bounds: the (n, Br) table splits must fit VMEM comfortably
_MAX_KNOTS = 2048
_MIN_BANK = 256


def _banked_eval_impl(data, a, b, idx, t, interpret=False):
    """Canonicalize to 2-D operands and run the sharding-aware core."""
    from .partition import sharded_banked_eval

    n = data.shape[0]
    bank_shape = data.shape[1:]
    out = sharded_banked_eval(bool(interpret))(
        data.reshape(n, -1),
        a.reshape(n - 1, -1),
        b.reshape(n - 1, -1),
        idx,
        t,
    )
    return out.reshape((idx.shape[0],) + bank_shape)


def _direct_kernel(t_ref, oh_ref, ohp_ref, d_ref, a_ref, b_ref, out_ref):
    f32 = jnp.float32
    # exact 3-way bf16 truncation splits, computed IN VMEM: the f32
    # tables stream from HBM once at 4 B/value instead of the 6 B/value
    # (and a full prep read+write pass) that materialized splits cost
    dh, dm, dl = _split3(d_ref[:])
    ah, am, al = _split3(a_ref[:])
    bh, bm, bl = _split3(b_ref[:])
    oh = oh_ref[:]    # (Bq, n) one-hot at idx
    ohp = ohp_ref[:]  # (Bq, n) one-hot at idx + 1
    ohab = oh[:, : a_ref.shape[0]]  # idx <= n-2, so column n-1 is 0

    def sel(o, hi, mid, lo):
        acc = jnp.dot(o, hi, preferred_element_type=f32)
        acc = acc + jnp.dot(o, mid, preferred_element_type=f32)
        return acc + jnp.dot(o, lo, preferred_element_type=f32)

    y_l = sel(oh, dh, dm, dl)   # d[:-1] and d[1:] merge into one d read
    y_r = sel(ohp, dh, dm, dl)
    a = sel(ohab, ah, am, al)
    b = sel(ohab, bh, bm, bl)
    t = t_ref[:]
    one = f32(1.0)
    out_ref[:] = (
        (one - t) * y_l + t * y_r + t * (one - t) * (a * (one - t) + b * t)
    )


def _banked_core(d2, a2, b2, idx, t, interpret=False):
    """Direct-read banked kernel: the f32 tables stream from HBM
    unmodified (12 B per knot-value across the 3 channels; ``d[:-1]``
    and ``d[1:]`` merge into one ``d`` read selected by a second
    one-hot at ``idx + 1``) and the exact bf16 truncation splits are
    computed in VMEM per tile.  This replaced a formulation that
    materialized the 12 bf16 splits in HBM first — 24 B/value of
    kernel reads plus a full-table prep pass under jit, which at the
    1e6-bank NS5b scale cost ~3x the table bytes and dominated the
    kernel (measured 14.0 -> ~7 ms/256q, BASELINE.md NS5b row).
    Selection stays exact one-hot bf16 matmuls accumulated in f32 —
    bit-identical to the gather formulation for finite tables.

    Blocks: bank tiles iterate in the OUTER grid dimension so each
    table tile is DMA'd once and reused across all query tiles; the
    bank tile width Br is chosen against the ~16 MB scoped-VMEM budget
    (Pallas double-buffers every block), which the direct reads leave
    roomy enough for Br up to 2048 at short knot axes — 4x fewer
    per-tile fixed costs than the split formulation's 512 cap.  Output
    is written at its EXACT (nq, bank) shape: Mosaic masks the ragged
    edge blocks, so no pad-and-slice epilogue copy of the ~1 GB result.
    """
    n = d2.shape[0]
    bank = d2.shape[1]
    nq = idx.shape[0]

    Bq = min(512, -(-nq // 8) * 8)
    nqb = -(-nq // Bq)
    # per-lane VMEM bytes: 3 f32 table rows double-buffered (24n) +
    # 9 bf16 split temps (18n) + f32 out double-buffered (8 Bq)
    per_lane = 24 * n + 18 * n + 8 * Bq
    Br = 128
    while Br < 2048 and Br < bank and 2 * Br * per_lane <= 10_000_000:
        Br *= 2
    Br = min(Br, -(-bank // 128) * 128) if bank >= 128 else bank
    nbb = -(-bank // Br)

    idx2 = idx.reshape(nq, 1)
    t2 = t.reshape(nq, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    oh = (idx2 == lanes).astype(jnp.bfloat16)
    ohp = (idx2 + 1 == lanes).astype(jnp.bfloat16)

    out = pl.pallas_call(
        _direct_kernel,
        # bank outer: each table tile is fetched once and reused across
        # every query tile (constant index over the inner dimension)
        grid=(nbb, nqb),
        in_specs=[
            pl.BlockSpec((Bq, 1), lambda bi, qi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bq, n), lambda bi, qi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bq, n), lambda bi, qi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, Br), lambda bi, qi: (0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n - 1, Br), lambda bi, qi: (0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n - 1, Br), lambda bi, qi: (0, bi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Bq, Br), lambda bi, qi: (qi, bi), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nq, bank), jnp.float32),
        interpret=interpret,
    )(t2, oh, ohp, d2, a2, b2)
    return out


@jax.custom_vjp
def banked_eval(data, a, b, idx, t):
    """Evaluate the Hermite form for a spline bank at per-query interval
    ``idx`` and fraction ``t``; bit-identical to the gather formulation."""
    return _banked_eval_impl(data, a, b, idx, t)


def _gather_form(data, a, b, idx, t):
    tbl = jnp.stack([data[:-1], data[1:], a, b], axis=-1)
    g = tbl[idx]
    y_l, y_r, ga, gb = (g[..., i] for i in range(4))
    te = t.reshape(t.shape + (1,) * (data.ndim - 1))
    one = jnp.ones((), data.dtype)
    return (
        (one - te) * y_l
        + te * y_r
        + te * (one - te) * (ga * (one - te) + gb * te)
    )


def _fwd(data, a, b, idx, t):
    return _banked_eval_impl(data, a, b, idx, t), (data, a, b, idx, t)


def _bwd(res, g):
    import numpy as np

    data, a, b, idx, t = res
    _, vjp = jax.vjp(
        lambda d_, a_, b_, t_: _gather_form(d_, a_, b_, idx, t_),
        data, a, b, t,
    )
    gd, ga, gb, gt = vjp(g)
    gidx = np.zeros(idx.shape, dtype=jax.dtypes.float0)  # int input
    return gd, ga, gb, gidx, gt


banked_eval.defvjp(_fwd, _bwd)


def can_use_banked(x, data) -> bool:
    """Shape/dtype eligibility (platform decided at lowering time)."""
    bank = 1
    for s in data.shape[1:]:
        bank *= s
    return (
        data.dtype == jnp.float32
        and data.ndim >= 2
        and 4 <= x.shape[0] <= _MAX_KNOTS
        and bank >= _MIN_BANK
    )
