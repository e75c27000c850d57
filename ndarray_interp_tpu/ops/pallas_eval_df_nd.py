"""f64-grade InterpND evaluation on f32 hardware (double-float).

The ND analogue of the DF bicubic gather route
(``pallas_eval_df.gathered_bicubic_eval_df_packed``): per-axis DF
``(idx, t)`` passes (the Pallas DF kernel on TPU when every axis fits a
windowed plan, the XLA DF-lexicographic form elsewhere), ONE packed
(hi, lo) cell-row gather, and a k-fold tensor-product Hermite (or
multilinear) tail in double-float — the Mosaic MXU weight-form kernel
on TPU (``_df_bicubic_weight_tail_mxu`` generalized over k axes and
both basis families), the per-channel XLA form elsewhere.

Eval contract: the same per-axis Hermite chain as the reference's 1-D
eval (``/root/reference/src/interp1d/strategies/cubic_spline.rs:818-828``)
applied tensor-product per axis, in the weight form of
``models/interpnd._cubic_weights`` (identical interpolant; DF rounding
differs from the f64 oracle at ~2^-48 of term scale).  Accuracy is
gated on chip at ≤4e-12 scale-relative (``tests/test_tpu_parity.py``).

Layout: ``pack_cubic_rows_nd_df`` packs the f64 strategy table
(``models/interpnd.pack_cubic_rows_nd``, channel order
``_cubic_digit_channels``: one base-4 digit per axis, axis 0 most
significant, digit = 2*deriv + side) into block-padded (hi | lo) rows
``(cells, 2 * nb * bp)`` with ``nb = 4^k`` (cubic) or ``2^k`` (linear,
corner order = ``itertools.product((0, 1), ...)`` = base-2 digits,
axis 0 most significant — the same digit convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .df import (
    df_add,
    df_mul,
    df_sub,
    fast_two_sum,
    no_guard,
    two_prod,
    two_sum,
)
from .pallas_eval_df import (
    _df_hermite_basis,
    _df_index_frac_xla,
    _unpack_f48_lo,
    fused_index_frac_df,
)


def _nd_bp(r):
    """Lanes per quantity block in the packed ND rows.

    Round 5: ``bp = r`` for ``r <= 8`` — the old unconditional roundup
    to 8 lanes padded a scalar-grid (r=1) tricubic row from 512 B to
    4 KB, and the ND3 anatomy (benches/ablate_df_nd.py) showed the
    cell gather paying the full padded bytes (~31 of the 66 ms route:
    random-gather throughput is byte-bound at these widths, not
    row-bound).  Wider trailing blocks keep the 8-lane roundup
    (waste <= 12.5%)."""
    return r if r <= 8 else -(-r // 8) * 8


def pack_rows_nd_df(rows_hi, rows_lo, nb, r):
    """Block-padded DF ND cell rows ``(cells, 2 * nb * bp)``: the ``nb``
    per-cell quantity blocks (ND cell layout) hi then lo, each r-block
    padded to ``bp`` lanes (``pack_bicubic_rows_df`` generalized)."""
    cells = rows_hi.shape[0]
    bp = _nd_bp(r)

    def blocks(v):
        v3 = v.reshape(cells, nb, r)
        if bp != r:
            v3 = jnp.pad(v3, ((0, 0), (0, 0), (0, bp - r)))
        return v3.reshape(cells, nb * bp)

    return jnp.concatenate([blocks(rows_hi), blocks(rows_lo)], axis=1)


def pack_rows_nd_f48(rows_hi, rows_lo, nb, r):
    """"f48" ND cell rows ``(cells, 3/2 * nb * bp)``: hi blocks as in
    ``pack_rows_nd_df`` plus the lo blocks rounded to bf16 and packed
    two-per-f32-lane (block j pairs with block j + nb/2 — the layout
    ``pallas_eval_df._unpack_f48_lo`` inverts).  75% of the DF table's
    memory/gather traffic at ~2^-33 relative; ``nb`` (= nbasis^k) is
    always even.  The k-axis generalization of
    ``pallas_eval_df.pack_bicubic_rows_f48``."""
    cells = rows_hi.shape[0]
    bp = _nd_bp(r)

    def blocks(v):
        v3 = v.reshape(cells, nb, r)
        if bp != r:
            v3 = jnp.pad(v3, ((0, 0), (0, 0), (0, bp - r)))
        return v3.reshape(cells, nb * bp)

    hi = blocks(rows_hi)
    lo16 = jax.lax.bitcast_convert_type(
        blocks(rows_lo).astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    half = (nb // 2) * bp
    packed_lo = jax.lax.bitcast_convert_type(
        (lo16[:, :half] << 16) | lo16[:, half:], jnp.float32
    )
    return jnp.concatenate([hi, packed_lo], axis=1)


def _df_linear_basis(t, one):
    """The multilinear weights ``[1-t, t]`` as DF pairs."""
    return (df_sub(one, t), t)


def _df_index_frac_nd(axes_pairs, q_flat, interpret=False):
    """Every axis's DF ``(idx, t)`` pass: Pallas DF kernels on TPU when
    every knot count fits a windowed plan, the XLA DF-lexicographic form
    elsewhere (``_df_index_frac_2d`` generalized).  ``q_flat`` is the
    flat tuple ``(q0_hi, q0_lo, q1_hi, q1_lo, ...)``; returns the flat
    tuple ``(idx_d, th_d, tl_d)`` per axis."""
    from .pallas_eval import _plan

    k = len(axes_pairs)

    def xla_frac(*qs):
        outs = []
        for d, (xh, xl) in enumerate(axes_pairs):
            outs.extend(
                _df_index_frac_xla(xh, xl, qs[2 * d], qs[2 * d + 1])
            )
        return tuple(outs)

    kernel_ok = all(
        _plan(xh.shape[0]) is not None for xh, _ in axes_pairs
    )
    if not kernel_ok:
        return xla_frac(*q_flat)

    def tpu_frac(*qs):
        outs = []
        for d, (xh, xl) in enumerate(axes_pairs):
            outs.extend(
                fused_index_frac_df(
                    xh, xl, qs[2 * d], qs[2 * d + 1], interpret=interpret
                )
            )
        return tuple(outs)

    return jax.lax.platform_dependent(
        *q_flat, tpu=tpu_frac, default=xla_frac
    )


def _df_basis_cols(ths, tls, nbasis):
    """Per-axis DF basis values as (B, 1)-shaped column pairs:
    ``bases[d][digit] = (hi, lo)``.

    The k axes' chains are BATCHED through one (B, k)-wide
    ``_df_hermite_basis`` call: a VPU op on k lanes issues exactly as
    many vregs as one on 1 lane, and the basis chain is ~170 guarded
    ops — running it once instead of k times removes the dominant
    narrow-op cost of the ND tail (round-5 DF anatomy, BASELINE.md)."""
    fn = _df_hermite_basis if nbasis == 4 else _df_linear_basis
    k = len(ths)
    if k == 1:
        one = (jnp.ones_like(ths[0]), jnp.zeros_like(ths[0]))
        return [fn((ths[0], tls[0]), one)]
    tstack = (
        jnp.concatenate(ths, axis=1),
        jnp.concatenate(tls, axis=1),
    )
    one = (jnp.ones_like(tstack[0]), jnp.zeros_like(tstack[0]))
    full = fn(tstack, one)  # nbasis pairs, each (B, k)
    return [
        [(p[0][:, d : d + 1], p[1][:, d : d + 1]) for p in full]
        for d in range(k)
    ]


def _df_nd_weight_tail_xla(rows, ths, tls, k, bp, nbasis):
    """Vectorized XLA DF tail: fold the per-axis basis columns into ONE
    (B, nbasis^k) DF weight matrix (repeat/tile, axis 0 most
    significant — the pack's channel order), DF-multiply against the
    (B, nb, bp) row blocks, and DF-accumulate by a halving tree (the
    Mosaic kernel's association).  The guarded-XLA twin of
    :func:`nd_df_tail_mxu` (identical interpolant; last-bit DF rounding
    differs from a sequential accumulation)."""
    nb = nbasis**k
    bases = _df_basis_cols(
        [t.reshape(-1, 1) for t in ths], [t.reshape(-1, 1) for t in tls],
        nbasis,
    )

    def basis_mat(basis):
        return (
            jnp.concatenate([p[0] for p in basis], axis=1),
            jnp.concatenate([p[1] for p in basis], axis=1),
        )

    w = basis_mat(bases[0])
    for d in range(1, k):
        wa = (
            jnp.repeat(w[0], nbasis, axis=1),
            jnp.repeat(w[1], nbasis, axis=1),
        )
        m = w[0].shape[1]
        br = basis_mat(bases[d])
        bb = (jnp.tile(br[0], (1, m)), jnp.tile(br[1], (1, m)))
        w = df_mul(wa, bb)
    b = rows.shape[0]
    blocks = (
        rows[:, : nb * bp].reshape(b, nb, bp),
        rows[:, nb * bp :].reshape(b, nb, bp),
    )
    hi, lo = df_mul((w[0][:, :, None], w[1][:, :, None]), blocks)
    while hi.shape[1] > 1:
        h = hi.shape[1] // 2
        hi, lo = df_add(
            (hi[:, :h], lo[:, :h]), (hi[:, h:], lo[:, h:])
        )
    return hi[:, 0], lo[:, 0]


def _df_nd_weight_row_mxu(ths, tls, k, bp, nbasis):
    """ROUND-4 row-major weight build, kept as the measured record
    (superseded by the channel-major ``_df_nd_weight_row_cm``, which
    is bit-identical and ~2x faster on the ND3 tail: the basis chain
    here runs on (B, 1)-shaped values at B/8 vreg-issues per op).
    Original description: (B, nbasis^k * bp) DF weight row by one-hot
    MXU expansions —
    ``_df_bicubic_weight_tail_mxu``'s weight build generalized: per-axis
    (B, nbasis) basis rows, folded together one axis at a time through
    0/1 repeat/tile matmuls (EXACT at ``Precision.HIGHEST``: every
    output column selects a single w*1 product), then the block
    expansion to ``bp`` lanes per channel.  Channel order: per-axis
    digits, axis 0 most significant — ``_cubic_digit_channels`` /
    ``itertools.product`` corner order."""
    b = ths[0].shape[0]
    bases = _df_basis_cols(ths, tls, nbasis)

    def basis_row(basis, part):
        im = jax.lax.broadcasted_iota(jnp.int32, (b, nbasis), 1)
        out = basis[nbasis - 1][part]
        for c in range(nbasis - 2, -1, -1):
            out = jnp.where(im == c, basis[c][part], out)
        return out

    def onehot_dot(a, sel):
        return jax.lax.dot(
            a, sel, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    w = (basis_row(bases[0], 0), basis_row(bases[0], 1))
    m = nbasis
    for d in range(1, k):
        wide = m * nbasis
        # repeat each of the m accumulated channels nbasis times ...
        ii = jax.lax.broadcasted_iota(jnp.int32, (m, wide), 1) // nbasis
        jj = jax.lax.broadcasted_iota(jnp.int32, (m, wide), 0)
        sel_a = (ii == jj).astype(jnp.float32)
        # ... and tile this axis's nbasis weights across them
        cc = jax.lax.broadcasted_iota(jnp.int32, (nbasis, wide), 1) % nbasis
        kk = jax.lax.broadcasted_iota(jnp.int32, (nbasis, wide), 0)
        sel_b = (cc == kk).astype(jnp.float32)
        wa = (onehot_dot(w[0], sel_a), onehot_dot(w[1], sel_a))
        br = (basis_row(bases[d], 0), basis_row(bases[d], 1))
        bb = (onehot_dot(br[0], sel_b), onehot_dot(br[1], sel_b))
        w = df_mul(wa, bb)
        m = wide
    if bp == 1:
        return w  # the block expansion is the identity (r=1 rows)
    half = m * bp
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, half), 1) // bp
    blk = jax.lax.broadcasted_iota(jnp.int32, (m, half), 0)
    sel = (lane == blk).astype(jnp.float32)
    return onehot_dot(w[0], sel), onehot_dot(w[1], sel)


def _df_nd_weight_cm_T(thT, tlT, k, nbasis):
    """(nbasis^k, B) DF weight matrix, built CHANNEL-MAJOR with
    queries in LANES (round 5): ``thT``/``tlT`` arrive as (k, B) —
    the ~170-guarded-op basis chain then issues B/128 vregs per op
    instead of the row-major build's B/8 (a VPU op's issue count
    scales with sublanes, not lanes), the per-axis (padded-4, B) basis
    stacks expand to (nb, B) factor matrices through exact K>=4
    one-hot HIGHEST matmuls (each output element a single w*1
    product; K=2 contractions hang the Mosaic compile — measured,
    docs/ROADMAP.md), k-1 wide DF muls fold them in the SAME
    left-to-right association as the row-major form (bit-identical,
    verified on chip), and one exact MXU transpose per part yields the
    (B, nb) weight matrix.  Measured on the ND3 tail: 23.3 → 12.8 ms
    at bq=512 (BASELINE.md round-5 addendum).  Channel order: base-
    ``nbasis`` digits, axis 0 most significant — the pack's order."""
    f32 = jnp.float32
    nb = nbasis**k
    one = (jnp.ones_like(thT), jnp.zeros_like(thT))
    fn = _df_hermite_basis if nbasis == 4 else _df_linear_basis
    basis = fn((thT, tlT), one)  # nbasis pairs, each (k, B)
    B = thT.shape[1]
    kpad = max(4, nbasis)  # avoid K<4 contractions (Mosaic hang)
    zero = jnp.zeros((1, B), f32)

    def stack_axis(d, part):
        rows = [basis[g][part][d : d + 1] for g in range(nbasis)]
        rows += [zero] * (kpad - nbasis)
        return jnp.concatenate(rows, axis=0)  # (kpad, B)

    mm = jax.lax.broadcasted_iota(jnp.int32, (nb, kpad), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (nb, kpad), 1)

    def expand(d):
        digit = (mm // (nbasis ** (k - 1 - d))) % nbasis
        sel = (digit == kk).astype(f32)  # (nb, kpad) one-hot rows
        return tuple(
            jax.lax.dot(sel, stack_axis(d, part),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=f32)
            for part in (0, 1)
        )  # (nb, B)

    w = expand(0)
    for d in range(1, k):
        w = df_mul(w, expand(d))
    return w  # (nb, B) channel-major pair


def _df_nd_weight_row_cm(thT, tlT, k, bp, nbasis):
    """Row-major (B, nb*bp) weight row from the channel-major build —
    the bp > 1 path (wide trailing blocks); bp == 1 routes stay fully
    channel-major in the kernel and never transpose the weights."""
    f32 = jnp.float32
    nb = nbasis**k
    w = _df_nd_weight_cm_T(thT, tlT, k, nbasis)
    w_h = w[0].T  # (B, nb) — exact MXU transpose
    w_l = w[1].T
    if bp == 1:
        return w_h, w_l
    half = nb * bp
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, half), 1) // bp
    blk = jax.lax.broadcasted_iota(jnp.int32, (nb, half), 0)
    sel = (lane == blk).astype(f32)

    def widen(a):
        return jax.lax.dot(a, sel, precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=f32)

    return widen(w_h), widen(w_l)


def _df_nd_mxu_body(rows_hi, rows_lo, ths, tls, k, bp, nbasis):
    """ROUND-4 kernel body (record; the shipped ``_df_nd_mxu_kernel``
    now builds weights channel-major).  EFT product on the HI half +
    compensated halving tree (the
    ``_df_bicubic_weight_tail_mxu`` accumulation, any k); the (hi, lo)
    row halves arrive pre-split (the f48 tier unpacks its bf16 lo half
    before this body)."""
    wrow_h, wrow_l = _df_nd_weight_row_mxu(ths, tls, k, bp, nbasis)
    p, pe = two_prod(wrow_h, rows_hi)
    e = pe + wrow_l * rows_hi + wrow_h * rows_lo
    while p.shape[1] > bp:
        h = p.shape[1] // 2
        s, se = two_sum(p[:, :h], p[:, h:])
        e = e[:, :h] + e[:, h:] + se
        p = s
    return fast_two_sum(p, e)


def _df_nd_mxu_kernel(rows_ref, th_ref, tl_ref, outh_ref, outl_ref,
                      *, k, bp, nbasis, tier):
    """Round-5 kernel: the t pairs arrive STACKED AND TRANSPOSED as
    two (k, B) refs so the weight build runs channel-major (see
    ``_df_nd_weight_row_cm``); the EFT product + compensated halving
    tree are unchanged from ``_df_nd_mxu_body``."""
    with no_guard():
        rows = rows_ref[:]
        half = (nbasis**k) * bp
        rows_hi = rows[:, :half]
        if tier == "f48":
            rows_lo = _unpack_f48_lo(rows[:, half:])
        else:
            rows_lo = rows[:, half:]
        if bp == 1:
            # Fully channel-major product/tree (round 5, second pass):
            # the GATHERED row halves are transposed to (nb, B) — two
            # exact MXU transposes — instead of transposing the weight
            # matrix; the EFT product then runs on full 128-lane vregs
            # (2x fewer issues than (B, nb)) and the compensated
            # halving tree folds over SUBLANES (widths nb..1 cost
            # width/8 x B/128 issues instead of B/8 per level — the
            # tree was the dominant post-weights cost, measured
            # 12.6 -> 4.6 ms on the ND3 tail, bit-identical).  Output
            # is written lane-major (1, B); the wrapper reshapes.
            w_h, w_l = _df_nd_weight_cm_T(th_ref[:], tl_ref[:], k, nbasis)
            z_hi = rows_hi.T  # (nb, B)
            z_lo = rows_lo.T
            p, pe = two_prod(w_h, z_hi)
            e = pe + w_l * z_hi + w_h * z_lo
            while p.shape[0] > 1:
                h = p.shape[0] // 2
                s, se = two_sum(p[:h], p[h:])
                e = e[:h] + e[h:] + se
                p = s
            hi, lo = fast_two_sum(p, e)  # (1, B)
            outh_ref[:] = hi
            outl_ref[:] = lo
            return
        wrow_h, wrow_l = _df_nd_weight_row_cm(
            th_ref[:], tl_ref[:], k, bp, nbasis
        )
        p, pe = two_prod(wrow_h, rows_hi)
        e = pe + wrow_l * rows_hi + wrow_h * rows_lo
        while p.shape[1] > bp:
            h = p.shape[1] // 2
            s, se = two_sum(p[:, :h], p[:, h:])
            e = e[:, :h] + e[:, h:] + se
            p = s
        hi, lo = fast_two_sum(p, e)
        outh_ref[:] = hi
        outl_ref[:] = lo


def nd_df_tail_mxu(
    rows, ts_flat, k, nbasis=4, interpret=False, bq=512, tier="df"
):
    """Streaming Mosaic MXU weight-form DF ND tail; rows
    ``(Q, 2 * nbasis^k * bp)`` (DF) or ``(Q, 3/2 * nbasis^k * bp)``
    (``tier="f48"``: bf16-pair lo half, unpacked in-kernel), Q a
    multiple of ``bq``; ``ts_flat`` =
    ``(th_0, tl_0, ..., th_{k-1}, tl_{k-1})`` flat (B,) arrays.
    Returns (hi, lo) of (Q, bp)."""
    nq, ch = rows.shape
    nb = nbasis**k
    bp = ch // (2 * nb) if tier == "df" else (2 * ch) // (3 * nb)
    bq = min(bq, nq)  # small query sets run as one block
    assert nq % bq == 0
    grid = (nq // bq,)
    thT = jnp.stack([ts_flat[2 * d] for d in range(k)], axis=0)  # (k, Q)
    tlT = jnp.stack([ts_flat[2 * d + 1] for d in range(k)], axis=0)
    if bp == 1:
        # all-channel-major kernel path: lane-major (1, Q) outputs
        out_specs = [
            pl.BlockSpec((1, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((1, nq), jnp.float32),
            jax.ShapeDtypeStruct((1, nq), jnp.float32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        ]
    outh, outl = pl.pallas_call(
        functools.partial(
            _df_nd_mxu_kernel, k=k, bp=bp, nbasis=nbasis, tier=tier
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(rows, thT, tlT)
    if bp == 1:
        return outh.reshape(nq, 1), outl.reshape(nq, 1)
    return outh, outl


def gathered_nd_eval_df_packed(
    k, grid_shape, r, nbasis=4, interpret=False, tier="df"
):
    """Factory for the DF ND gather route on a PREPACKED table: returns
    ``route(x0_hi, x0_lo, ..., packed, q0_hi, q0_lo, ...) -> (hi, lo)``
    of shape ``(Q, r)`` each.

    ``grid_shape``: the k leading data dims (static — cell strides).
    ``nbasis``: 4 for the tensor-product cubic (cell layout), 2 for
    multilinear.  ``tier="f48"`` expects a ``pack_rows_nd_f48`` table
    (bf16-pair lo half — 75% of the DF memory/gather traffic at ~2^-33
    relative).  k-axis analogue of
    ``gathered_bicubic_eval_df_packed``."""
    cells = tuple(n - 1 for n in grid_shape)
    cstrides = [1] * k
    for d in range(k - 2, -1, -1):
        cstrides[d] = cstrides[d + 1] * cells[d + 1]

    def route(*ops):
        axes_pairs = [
            (ops[2 * d], ops[2 * d + 1]) for d in range(k)
        ]
        packed = ops[2 * k]
        q_flat = ops[2 * k + 1 :]
        from ..utils.hygiene import check_route_tables

        check_route_tables(
            "gathered_nd_eval_df_packed route", [("packed", packed)], q_flat
        )
        nq = q_flat[0].shape[0]
        npad = -(-nq // 512) * 512 - nq
        if npad:
            q_flat = tuple(jnp.pad(q, (0, npad)) for q in q_flat)
        parts = _df_index_frac_nd(
            axes_pairs, q_flat, interpret=interpret
        )
        idx = [parts[3 * d] for d in range(k)]
        ts_flat = []
        for d in range(k):
            ts_flat += [parts[3 * d + 1], parts[3 * d + 2]]
        cell = sum(i * s for i, s in zip(idx, cstrides))
        rows = jnp.take(packed, cell, axis=0)
        nb = nbasis**k
        ch = packed.shape[1]
        bp = ch // (2 * nb) if tier == "df" else (2 * ch) // (3 * nb)

        def mosaic(rows, *ts):
            hi, lo = nd_df_tail_mxu(
                rows, ts, k, nbasis=nbasis, interpret=interpret, tier=tier
            )
            return hi[:, :r], lo[:, :r]

        def xla(rows, *ts):
            ths = [ts[2 * d] for d in range(k)]
            tls = [ts[2 * d + 1] for d in range(k)]
            if tier == "f48":
                rows = jnp.concatenate(
                    [
                        rows[:, : nb * bp],
                        _unpack_f48_lo(rows[:, nb * bp :]),
                    ],
                    axis=1,
                )
            hi, lo = _df_nd_weight_tail_xla(rows, ths, tls, k, bp, nbasis)
            return hi[:, :r], lo[:, :r]

        hi, lo = jax.lax.platform_dependent(
            rows, *ts_flat, tpu=mosaic, default=xla
        )
        return hi[:nq], lo[:nq]

    return route
