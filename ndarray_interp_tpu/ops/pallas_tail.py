"""Gather-route evaluation: one packed-row gather + a fused tail.

The wide-bank evaluation regimes (large knot count x many queries x
moderate bank) cannot avoid XLA's gather engine for the row fetch
(~6 ns/query-row on v5e regardless of formulation — measured dead ends:
one-hot MXU select is O(n x bank) MACs/query, per-row DMA is ~51 ns/row,
sort-and-bin pays the same gather again to restore query order).  What
CAN be fixed is everything around the gather: the reference-shaped XLA
formulation (``cubic_spline.rs:791-830`` vectorized) spends ~20 ms/1M
queries on two extra ``x[idx]`` gathers; this module replaces that with

1. one fused Pallas bucketize emitting ``(idx, t)`` in a single pass
   (``pallas_eval.fused_index_frac``),
2. ONE gather of tightly packed ``[y_l | y_r | a | b]`` rows, and
3. an XLA Hermite tail on contiguous channel slices, which XLA fuses
   into the gather consumer.

Measured on the 10k-knot x 64-bank x 1M-query workload: 26 ms (three
gathers + strided tail) -> 10.7 ms.

**Negative result, kept with tests as the record**: the streaming
Pallas tails in this module (``banked_hermite_tail``, ``bilinear_tail``)
measured SLOWER than the XLA tails they were meant to replace (banked:
12.6 vs 10.7 ms; bilinear: 7.9 vs 1.9 ms) — the extra kernel boundary
re-streams the gathered gigabyte that XLA otherwise consumes in-fusion,
and sub-128-lane blocks relayout badly.  Production dispatch uses the
XLA tails.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rows_ref, t_ref, out_ref, *, bank):
    f32 = jnp.float32
    rows = rows_ref[:]  # (Bq, 4*bank_pad)
    t = t_ref[:]  # (Bq, 1) -> broadcasts over bank lanes
    bp = rows.shape[1] // 4
    y_l = rows[:, 0 * bp : 0 * bp + bank]
    y_r = rows[:, 1 * bp : 1 * bp + bank]
    a = rows[:, 2 * bp : 2 * bp + bank]
    b = rows[:, 3 * bp : 3 * bp + bank]
    one = f32(1.0)
    # same op order as cubic_spline.rs:818-828 / the gather formulation
    out_ref[:] = (
        (one - t) * y_l + t * y_r + t * (one - t) * (a * (one - t) + b * t)
    )


def pack_bank_rows(data2, a2, b2):
    """Build the packed per-interval row table ``(n-1, 4*bank_pad)``.

    Channels are packed TIGHTLY (bank padded only to a multiple of 8):
    the gather engine's cost grows with row bytes beyond ~1 KB (measured
    ~300 GB/s effective), so padding each channel to 128 lanes would
    double the fetch for a 64-wide bank; Mosaic lane-slices at the
    resulting non-tile offsets fine.  data2 (n, bank), a2/b2 (n-1, bank)."""
    bank = data2.shape[1]
    bp = -(-bank // 8) * 8
    pad = ((0, 0), (0, bp - bank))
    return jnp.concatenate(
        [
            jnp.pad(data2[:-1], pad),
            jnp.pad(data2[1:], pad),
            jnp.pad(a2, pad),
            jnp.pad(b2, pad),
        ],
        axis=1,
    )


def banked_hermite_tail(rows, t, bank, interpret=False):
    """Evaluate the Hermite form on gathered rows.

    rows: (Q, 4*bank_pad) — output of ``jnp.take(pack_bank_rows(...), idx)``
    with Q already a multiple of 512 (pad ``idx``/``t`` BEFORE the gather:
    padding the gathered array itself would copy gigabytes);
    t: (Q,) fractions.  Returns (Q, bank) f32.
    """
    nq = rows.shape[0]
    ch = rows.shape[1]
    bq = 512
    assert nq % bq == 0, "pad idx/t to a 512 multiple before the gather"
    nb = nq // bq
    t2 = t.reshape(nq, 1)
    bp = ch // 4
    out = pl.pallas_call(
        functools.partial(_kernel, bank=bp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        interpret=interpret,
    )(rows, t2)
    return out[:, :bank]


# -- bilinear: packed-corner-row gather + streaming lerp tail -----------------


def _bilinear_kernel(rows_ref, qx_ref, qy_ref, out_ref, *, r):
    from .lerp import calc_frac

    rows = rows_ref[:]  # (Bq, 4r+4 padded)
    qx = qx_ref[:]  # (Bq, 1)
    qy = qy_ref[:]
    z11 = rows[:, 0 * r : 1 * r]
    z12 = rows[:, 1 * r : 2 * r]
    z21 = rows[:, 2 * r : 3 * r]
    z22 = rows[:, 3 * r : 4 * r]
    x1 = rows[:, 4 * r : 4 * r + 1]
    x2 = rows[:, 4 * r + 1 : 4 * r + 2]
    y1 = rows[:, 4 * r + 2 : 4 * r + 3]
    y2 = rows[:, 4 * r + 3 : 4 * r + 4]
    # same lerp composition/order as bilinear.rs:88-97 (via calc_frac)
    z1 = calc_frac(x1, z11, x2, z21, qx)
    z2 = calc_frac(x1, z12, x2, z22, qx)
    out_ref[:] = calc_frac(y1, z1, y2, z2, qy)


def bilinear_tail(rows, qx, qy, r, interpret=False):
    """Three calc_frac lerps on gathered corner rows, streamed through
    VMEM (rows: (Q, ch) with Q a multiple of 512, ch >= 4r+4; see
    ``bilinear.pack_corner_rows``).  Returns (Q, r) f32."""
    nq, ch = rows.shape
    bq = 512
    assert nq % bq == 0
    nb = nq // bq
    out = pl.pallas_call(
        functools.partial(_bilinear_kernel, r=r),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bq, r), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nq, r), jnp.float32),
        interpret=interpret,
    )(rows, qx.reshape(nq, 1), qy.reshape(nq, 1))
    return out


def _bilinear_xla_form(rows_tbl, cell, qx, qy, r):
    """XLA slice+lerp oracle on the packed table (VJP + fallback)."""
    from .lerp import calc_frac

    g = jnp.take(rows_tbl, cell, axis=0)
    z11 = g[:, 0 * r : 1 * r]
    z12 = g[:, 1 * r : 2 * r]
    z21 = g[:, 2 * r : 3 * r]
    z22 = g[:, 3 * r : 4 * r]
    x1 = g[:, 4 * r : 4 * r + 1]
    x2 = g[:, 4 * r + 1 : 4 * r + 2]
    y1 = g[:, 4 * r + 2 : 4 * r + 3]
    y2 = g[:, 4 * r + 3 : 4 * r + 4]
    qxe = qx[:, None]
    qye = qy[:, None]
    z1 = calc_frac(x1, z11, x2, z21, qxe)
    z2 = calc_frac(x1, z12, x2, z22, qxe)
    return calc_frac(y1, z1, y2, z2, qye)


def _bilinear_gathered_impl(rows_tbl, cell, qx, qy, r, interpret=False):
    nq = cell.shape[0]
    npad = -(-nq // 512) * 512 - nq
    if npad:
        cell = jnp.pad(cell, (0, npad))
        qx = jnp.pad(qx, (0, npad))
        qy = jnp.pad(qy, (0, npad))
    rows = jnp.take(rows_tbl, cell, axis=0)
    return bilinear_tail(rows, qx, qy, r, interpret=interpret)[:nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _bilinear_gathered_vjp(rows_tbl, cell, qx, qy, r):
    return _bilinear_gathered_impl(rows_tbl, cell, qx, qy, r)


def bilinear_gathered_eval(rows_tbl, cell, qx, qy, r):
    """Bilinear gather route: one packed corner-row gather + streaming
    lerp tail (reference semantics ``bilinear.rs:64-98``).  rows_tbl:
    ((nx-1)*(ny-1), >=4r+4); cell/qx/qy flat.  Backward = VJP of the
    XLA formulation.  Hygiene check in this wrapper, outside the
    custom_vjp (which lifts all args to tracers — see
    ``gathered_bank_eval``)."""
    from ..utils.hygiene import check_route_tables

    check_route_tables(
        "bilinear_gathered_eval", [("rows_tbl", rows_tbl)], (cell, qx, qy)
    )
    return _bilinear_gathered_vjp(rows_tbl, cell, qx, qy, r)


def _bl_fwd(rows_tbl, cell, qx, qy, r):
    out = _bilinear_gathered_impl(rows_tbl, cell, qx, qy, r)
    return out, (rows_tbl, cell, qx, qy)


def _bl_bwd(r, res, g):
    import numpy as np

    rows_tbl, cell, qx, qy = res
    _, vjp = jax.vjp(
        lambda rt, qx_, qy_: _bilinear_xla_form(rt, cell, qx_, qy_, r),
        rows_tbl, qx, qy,
    )
    gr, gx, gy = vjp(g)
    gcell = np.zeros(cell.shape, dtype=jax.dtypes.float0)
    return gr, gcell, gx, gy


_bilinear_gathered_vjp.defvjp(_bl_fwd, _bl_bwd)


# -- bicubic: weight-form streaming tail --------------------------------------


def _bicubic_basis(t, one):
    """Scaled-Hermite weights (w_yl, w_yr, w_Kl, w_Kr) of
    ``bicubic._hermite_scaled`` in closed form: u + p*d, t - p*d, p*u,
    -p*t with u = 1-t, p = t*u, d = u-t."""
    u = one - t
    p = t * u
    pd = p * (u - t)
    return (u + pd, t - pd, p * u, -(p * t))


def _bicubic_weights(tx, ty, one):
    """The 16 tensor-product weights, one per cell-row block
    ``b = 4*i + c`` (quantity i in [f, kx, ky, kxy], corner c in
    [11, 12, 21, 22]): W[b] = Ax[i][c>>1] * Ay[i][c&1] — the closed
    form of the 5-Hermite nesting in ``BicubicStrategy._eval_cell``."""
    bx = _bicubic_basis(tx, one)
    by = _bicubic_basis(ty, one)
    w16 = []
    for i in range(4):
        ax = (bx[0], bx[1]) if i in (0, 2) else (bx[2], bx[3])
        ay = (by[0], by[1]) if i in (0, 1) else (by[2], by[3])
        for c in range(4):
            w16.append(ax[c >> 1] * ay[c & 1])
    return w16


def _bicubic_weight_kernel(rows_ref, tx_ref, ty_ref, out_ref, *, r):
    """Weight-form bicubic tail: 16 per-query scalar weights, one
    (B, 1)-broadcast multiply per block, sequential accumulation.

    MEASURED NEGATIVE RESULT (round 3, NS3b 1M queries): this route
    costs 30.0 ms vs 15.6 ms for the XLA nested tail (27.7 ms for a
    lane-packed variant).  The kernel cannot undo the gather-fusion
    boundary — the gathered GB is materialized as its input either
    way — and the (B, r) sub-128-lane blocks pad to full lanes in
    VMEM, so the tail re-streams MORE bytes than XLA's fused form.
    Kept (with tests) as the record; the strategy does not route here."""
    rows = rows_ref[:]  # (B, 16r)
    tx = tx_ref[:]  # (B, 1)
    ty = ty_ref[:]
    one = jnp.float32(1.0)
    w16 = _bicubic_weights(tx, ty, one)
    # sequential accumulation: sub-128-lane (B, r) arrays live
    # lane-padded in VMEM, so keeping all 16 products for a tree
    # inflates the scoped footprint ~8x for r=16
    out = w16[0] * rows[:, :r]
    for b in range(1, 16):
        out = out + w16[b] * rows[:, b * r : (b + 1) * r]
    out_ref[:] = out


def bicubic_weight_tail(rows, tx, ty, r, interpret=False, bq=512):
    """Streaming Mosaic weight-form bicubic tail on gathered cell rows
    ``(Q, 16r)`` (Q a multiple of bq; 16r lane-aligned works best).
    Returns (Q, r) f32.  Summation order differs from the nested
    Hermite (tree over blocks) — equal to ~1e-6 relative."""
    nq, ch = rows.shape
    assert nq % bq == 0, "pad cell/t to a block multiple before the gather"
    nb = nq // bq
    return pl.pallas_call(
        functools.partial(_bicubic_weight_kernel, r=r),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bq, r), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nq, r), jnp.float32),
        interpret=interpret,
    )(rows, tx.reshape(nq, 1), ty.reshape(nq, 1))


def _bicubic_weight_xla(rows, tx, ty, r):
    """Weight-form bicubic tail in plain XLA (VJP of the gather route;
    same math as the kernel, block-summed)."""
    one = jnp.float32(1.0)
    w16 = _bicubic_weights(tx[:, None], ty[:, None], one)
    out = w16[0] * rows[:, :r]
    for b in range(1, 16):
        out = out + w16[b] * rows[:, b * r : (b + 1) * r]
    return out


def _bicubic_gathered_impl(rows_tbl, cell, tx, ty, r, interpret=False):
    nq = cell.shape[0]
    npad = -(-nq // 512) * 512 - nq
    if npad:
        cell = jnp.pad(cell, (0, npad))
        tx = jnp.pad(tx, (0, npad))
        ty = jnp.pad(ty, (0, npad))
    rows = jnp.take(rows_tbl, cell, axis=0)
    return bicubic_weight_tail(rows, tx, ty, r, interpret=interpret)[:nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _bicubic_gathered_vjp(rows_tbl, cell, tx, ty, r):
    return _bicubic_gathered_impl(rows_tbl, cell, tx, ty, r)


def bicubic_gathered_eval(rows_tbl, cell, tx, ty, r):
    """Bicubic cell-gather route: ONE packed 16r-channel row gather +
    the streaming weight-form Mosaic tail (``bicubic_weight_tail``).
    rows_tbl: ((nx-1)*(ny-1), 16r) from ``bicubic.pack_bicubic_rows``;
    cell/tx/ty flat.  Backward = VJP of the XLA weight form.  Hygiene
    check in this wrapper, outside the custom_vjp (see
    ``gathered_bank_eval``).

    NOT routed by the strategy: measured 30.0 ms/1M on NS3b vs
    15.6 ms for the XLA nested tail (see ``_bicubic_weight_kernel``)."""
    from ..utils.hygiene import check_route_tables

    check_route_tables(
        "bicubic_gathered_eval", [("rows_tbl", rows_tbl)], (cell, tx, ty)
    )
    return _bicubic_gathered_vjp(rows_tbl, cell, tx, ty, r)


def _bc_fwd(rows_tbl, cell, tx, ty, r):
    out = _bicubic_gathered_impl(rows_tbl, cell, tx, ty, r)
    return out, (rows_tbl, cell, tx, ty)


def _bc_bwd(r, res, g):
    import numpy as np

    rows_tbl, cell, tx, ty = res
    _, vjp = jax.vjp(
        lambda rt, a, b: _bicubic_weight_xla(
            jnp.take(rt, cell, axis=0), a, b, r
        ),
        rows_tbl, tx, ty,
    )
    gr, gx, gy = vjp(g)
    gcell = np.zeros(cell.shape, dtype=jax.dtypes.float0)
    return gr, gcell, gx, gy


_bicubic_gathered_vjp.defvjp(_bc_fwd, _bc_bwd)


def _bicubic_mxu_weight_row(tx, ty, bp):
    """(B, 16*bp) f32 tensor-product weight row built by one-hot MXU
    matmuls — the f32 analogue of the DF route's
    ``_df_bicubic_weight_tail_mxu`` weight build
    (``pallas_eval_df.py``): (B, 1) Hermite bases → (B, 4) basis rows →
    (B, 16) block weights → the (B, 16*bp) full-lane row.  Every
    widening matmul is against a 0/1 matrix and runs at
    ``Precision.HIGHEST`` (the default f32 matmul is ONE bf16 MXU pass,
    measured 2.1e-3 rel err on chip; bf16x3 against a one-hot matrix is
    exact) — the MXU does the relayouts that ``broadcast_to``+concat
    forms pay Mosaic relayouts for."""
    b = tx.shape[0]
    one = jnp.float32(1.0)
    bx = _bicubic_basis(tx, one)
    by = _bicubic_basis(ty, one)

    def basis_row(basis):
        i4 = jax.lax.broadcasted_iota(jnp.int32, (b, 4), 1)
        return jnp.where(
            i4 == 0,
            basis[0],
            jnp.where(
                i4 == 1, basis[1], jnp.where(i4 == 2, basis[2], basis[3])
            ),
        )

    def onehot_dot(a, sel):
        return jax.lax.dot(
            a, sel, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    # block j = 4i + c (quantity i, corner c): x-basis index
    # (c//2) + 2*[i odd] (kx/kxy take the derivative weights), y-basis
    # index (c%2) + 2*[i >= 2] — 0/1 matrices built from iota (Pallas
    # kernels cannot capture constant arrays)
    jj = jax.lax.broadcasted_iota(jnp.int32, (4, 16), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (4, 16), 0)
    qi = jj // 4
    cc = jj % 4
    px = ((cc // 2 + 2 * (qi % 2)) == kk).astype(jnp.float32)
    py = ((cc % 2 + 2 * (qi // 2)) == kk).astype(jnp.float32)
    w16 = onehot_dot(basis_row(bx), px) * onehot_dot(basis_row(by), py)
    half = 16 * bp
    lane = jax.lax.broadcasted_iota(jnp.int32, (16, half), 1) // bp
    blk = jax.lax.broadcasted_iota(jnp.int32, (16, half), 0)
    sel = (lane == blk).astype(jnp.float32)
    return onehot_dot(w16, sel)


def _bicubic_mxu_kernel(rows_ref, tx_ref, ty_ref, out_ref, *, bp):
    wrow = _bicubic_mxu_weight_row(tx_ref[:], ty_ref[:], bp)
    p = wrow * rows_ref[:]  # ONE full-lane multiply
    # halving tree: lane-aligned slices down to 128, sub-lane only at
    # the last levels (the same shape as the DF tail's compensated tree)
    while p.shape[1] > bp:
        h = p.shape[1] // 2
        p = p[:, :h] + p[:, h:]
    out_ref[:] = p


def bicubic_mxu_tail(rows, tx, ty, interpret=False, bq=1024):
    """Full-lane MXU weight-form f32 bicubic tail on gathered cell rows
    ``(Q, 16r)`` — the f32 analogue of ``bicubic_df_tail_mxu``: MXU
    one-hot weight-row build + ONE elementwise multiply across the whole
    row + a halving tree, instead of 16 per-block sub-lane broadcast
    multiplies (``bicubic_weight_tail``'s measured failure mode).
    Q must be a multiple of ``bq``; ``r`` must make ``16r`` a multiple
    of 128 (r % 8 == 0).  Returns (Q, r) f32.  Summation order is a
    tree over blocks — differs from the nested Hermite at ~1e-6
    relative, like the weight form."""
    nq, ch = rows.shape
    bp = ch // 16
    assert nq % bq == 0, "pad cell/t to a block multiple before the gather"
    nb = nq // bq
    return pl.pallas_call(
        functools.partial(_bicubic_mxu_kernel, bp=bp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        interpret=interpret,
    )(rows, tx.reshape(nq, 1), ty.reshape(nq, 1))


@jax.custom_vjp
def _gathered_bank_eval_vjp(data2, a2, b2, idx, t):
    from .partition import sharded_gathered_eval

    return sharded_gathered_eval(False)(data2, a2, b2, idx, t)


def gathered_bank_eval(data2, a2, b2, idx, t):
    """Gather-route banked evaluation: ONE packed row gather -> streaming
    Hermite tail.  f32; ``idx``/``t`` flat (from ``fused_index_frac``).

    Same interval values and op order as the gather formulation (the
    packed row is exact f32); the single gather replaces its separate
    ``tbl[idx]`` + 2x ``x[idx]`` engine passes.  Backward pass is the
    VJP of the gather formulation (like ``banked_eval``); under a mesh
    the query/bank axes partition with zero communication
    (``ops/partition.py``).

    The hygiene check lives in this wrapper, OUTSIDE the custom_vjp:
    custom_vjp lifts every argument to a tracer before the primal body
    runs, so a closure-captured concrete table is only distinguishable
    here (``utils/hygiene.py:check_route_tables``).
    """
    from ..utils.hygiene import check_route_tables

    check_route_tables(
        "gathered_bank_eval",
        [("data2", data2), ("a2", a2), ("b2", b2)],
        (idx, t),
    )
    return _gathered_bank_eval_vjp(data2, a2, b2, idx, t)


def _gathered_impl(data2, a2, b2, idx, t, interpret=False):
    del interpret  # XLA tail: no kernel to interpret
    bank = data2.shape[1]
    packed = pack_bank_rows(data2, a2, b2)
    rows = jnp.take(packed, idx, axis=0)
    # XLA tail on contiguous channel slices: measured FASTER than the
    # streaming Pallas tail (10.7 vs 12.6 ms on the 10k x 64 x 1M
    # workload) — XLA fuses the Hermite into the gather consumer, while
    # the extra kernel boundary re-streams the gathered gigabyte.  Same
    # conclusion as the bilinear tail (see module docstring).
    bp = rows.shape[1] // 4
    te = t[:, None]
    y_l = rows[:, 0 * bp : 0 * bp + bank]
    y_r = rows[:, 1 * bp : 1 * bp + bank]
    a = rows[:, 2 * bp : 2 * bp + bank]
    b = rows[:, 3 * bp : 3 * bp + bank]
    one = jnp.float32(1.0)
    # same op order as cubic_spline.rs:818-828 / the gather formulation
    return (
        (one - te) * y_l
        + te * y_r
        + te * (one - te) * (a * (one - te) + b * te)
    )


def _gather_form_2d(d2, a2, b2, idx, t):
    y_l = d2[:-1][idx]
    y_r = d2[1:][idx]
    ga = a2[idx]
    gb = b2[idx]
    te = t[:, None]
    one = jnp.ones((), d2.dtype)
    return (
        (one - te) * y_l
        + te * y_r
        + te * (one - te) * (ga * (one - te) + gb * te)
    )


def _fwd(data2, a2, b2, idx, t):
    from .partition import sharded_gathered_eval

    out = sharded_gathered_eval(False)(data2, a2, b2, idx, t)
    return out, (data2, a2, b2, idx, t)


def _bwd(res, g):
    import numpy as np

    data2, a2, b2, idx, t = res
    _, vjp = jax.vjp(
        lambda d_, a_, b_, t_: _gather_form_2d(d_, a_, b_, idx, t_),
        data2, a2, b2, t,
    )
    gd, ga, gb, gt = vjp(g)
    gidx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return gd, ga, gb, gidx, gt


_gathered_bank_eval_vjp.defvjp(_fwd, _bwd)
