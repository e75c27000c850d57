"""Fused banked evaluation kernel: one-hot select + Hermite, in VMEM.

Banked cubic/Hermite evaluation (one knot axis, a wide bank of splines
sharing it — ``cubic_spline.rs:791-830`` vectorized over trailing axes)
was gather-bound in XLA: the one-hot row gather ran at HIGHEST precision
(six MXU passes) and materialized a 4-channel (Q, bank) intermediate in
HBM before the polynomial tail streamed it again (~4.5 ms for a 4k-query
16k-spline bank on v5e).

This kernel does the selection with exact 3-way bf16 truncation splits
(see ``pallas_eval._split3`` — bit-identical to f32 at half the passes)
and evaluates the Hermite form on the selected channels while they are
still VMEM-resident, writing only the final (Q, bank) result.  The grid
iterates bank tiles in the outer dimension so each table tile is DMA'd
once and reused across all query tiles.

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


def _kernel(t_ref, oh_ref, ylh, ylm, yll, yrh, yrm, yrl, ah, am, al,
            bh, bm, bl, out_ref):
    f32 = jnp.float32
    oh = oh_ref[:]  # (Bq, n) bf16, exact one-hot rows

    def sel(hi, mid, lo):
        acc = jnp.dot(oh, hi[:], preferred_element_type=f32)
        acc = acc + jnp.dot(oh, mid[:], preferred_element_type=f32)
        return acc + jnp.dot(oh, lo[:], preferred_element_type=f32)

    y_l = sel(ylh, ylm, yll)  # (Bq, Br), bit-exact f32 rows
    y_r = sel(yrh, yrm, yrl)
    a = sel(ah, am, al)
    b = sel(bh, bm, bl)

    t = t_ref[:]  # (Bq, 1) -> broadcasts along the bank lanes
    one = f32(1.0)
    # same op order as cubic_spline.rs:818-828 / the XLA gather path
    out_ref[:] = (
        (one - t) * y_l + t * y_r + t * (one - t) * (a * (one - t) + b * t)
    )


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


def _banked_core(d2, a2, b2, idx, t, interpret=False):
    n = d2.shape[0]
    bank = d2.shape[1]
    nq = idx.shape[0]
    n_pad = -(-(n - 1) // 128) * 128  # one-hot lane dim

    splits = []
    for tblv in (d2[:-1], d2[1:], a2, b2):
        if n - 1 < n_pad:
            tblv = jnp.concatenate(
                [tblv, jnp.zeros((n_pad - (n - 1), bank), tblv.dtype)]
            )
        splits.extend(_split3(tblv))

    Bq = min(512, -(-nq // 8) * 8)
    nqb = -(-nq // Bq)
    # Br = 512 is near the VMEM ceiling already: Pallas double-buffers
    # every block (measured: a Br=1024 plan with 8.5 MB of blocks OOMs
    # the 16 MB scoped VMEM at exactly 17.0 MB = 2x), so the 12 bf16
    # table splits + the (Bq, Br) f32 out cap Br at ~512-768 — widening
    # to amortize the ~2k-block fixed cost at 1e6-bank scales
    # (BASELINE.md NS5b roofline row) is not available on this chip.
    Br = 512 if bank >= 512 else -(-bank // 128) * 128
    nbb = -(-bank // Br)

    idx_p = jnp.pad(idx, (0, nqb * Bq - nq)).reshape(nqb * Bq, 1)
    t_p = jnp.pad(t, (0, nqb * Bq - nq)).reshape(nqb * Bq, 1)
    oh = (
        idx_p == jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    ).astype(jnp.bfloat16)  # (Q_pad, n_pad)

    if nbb * Br != bank:
        splits = [
            jnp.pad(s, ((0, 0), (0, nbb * Br - bank))) for s in splits
        ]

    out = pl.pallas_call(
        _kernel,
        # bank outer: each table tile is fetched once and reused across
        # every query tile (constant index over the inner dimension)
        grid=(nbb, nqb),
        in_specs=[
            pl.BlockSpec((Bq, 1), lambda bi, qi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bq, n_pad), lambda bi, qi: (qi, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((n_pad, Br), lambda bi, qi: (0, bi),
                         memory_space=pltpu.VMEM)
        ]
        * 12,
        out_specs=pl.BlockSpec(
            (Bq, Br), lambda bi, qi: (qi, bi), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nqb * Bq, nbb * Br), jnp.float32),
        interpret=interpret,
    )(t_p, oh, *splits)
    return out[:nq, :bank]


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
