"""Large-knot-axis evaluation (n > 64k): hierarchical search + one gather.

The fused Pallas kernels stop at 64k knots: their per-query cost is
O(C + C*K) with C = n/W blocks, so by 256k the one-hot fetch alone is
megaMACs per query, and the knot/coefficient tables outgrow VMEM.  Past
that scale the TPU's gather engine (~6 ns/query-row, flat in table size
— docs/ROADMAP.md) becomes the *better* per-query fetch primitive; what
must be avoided is XLA's default large-n searchsorted, whose ``scan``
method issues log2(n) chained dynamic-gathers (measured 87 ms/1M queries
already at n=2048).

This module is pure XLA (no Pallas — CPU-testable, grad- and
mesh-friendly) and costs a FLAT ~2 matmul-ms + one gather per million
queries at any n up to ~8M knots:

1. two-stage block search for the W-knot block containing q:
   compare against C1 super-leaders (broadcast compares), fetch the
   query's C2 sub-leaders with an exact one-hot matmul (3-way bf16
   truncation split, ``pallas_eval._split3``), compare again —
   block = s*C2 + count - 1, clamped like ``get_lower_index``;
2. ONE gather of the block's packed row
   ``[knots[W+1] | data[W+1] | a[W] | b[W]]`` (~290 B);
3. mask-reduce the exact interval within the window and evaluate the
   Hermite symmetric form with the reference op order
   (``cubic_spline.rs:791-830``; linear encodes a = b = 0).

Semantics identical to the fused kernel: clamp to ``[0, n-2]`` incl.
±inf; NaN queries yield NaN; OOB handling lives in the driver.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .pallas_eval import _plan, _split3

# largest axis whose W=128 leader vector satisfies C + 1 <= 65536
# (the windowed plan cap): 65535 * 128
MAX_BIG_KNOTS = 65535 * 128


def _block_w(n):
    """Block width: smallest tier keeping the leader vector within the
    windowed Pallas kernel's 64k plan (C + 1 <= 65536)."""
    for w in (16, 32, 64, 128):
        if -(-n // w) + 1 <= 65536:
            return w
    raise ValueError(f"knot axis too long: {n}")


def _geometry(n):
    w = _block_w(n)
    c = -(-n // w)  # blocks of W knots (ceil)
    c1 = max(2, math.isqrt(c - 1) + 1)
    c2 = -(-c // c1)
    return w, c, c1, c2


def _pad_knots(knots, w, c1, c2):
    """knots padded to C1*C2*W + 1 with the largest-finite sentinel (the
    same out-of-range convention as ``pallas_eval._pack_windows``;
    C1*C2 >= C so the XLA two-stage's (C1, C2) leader table is full)."""
    n = knots.shape[0]
    total = c1 * c2 * w + 1
    big = jnp.asarray(jnp.finfo(knots.dtype).max, knots.dtype)
    return jnp.concatenate(
        [knots, jnp.full((total - n,), big, knots.dtype)]
    )


def _block_of(kp, n, w, c, c1, c2, q, interpret=False, pallas=True):
    """Block index: the W-knot block containing q, clamped so the final
    interval's block is the maximum.

    The leader vector (one knot per block, C <= 64k entries) is itself a
    small-n search problem: on TPU the windowed Pallas bucketize handles
    it entirely in VMEM (~4x the XLA two-stage formulation, whose one-hot
    and (Q, C2) leader intermediates stream through HBM).  The XLA
    two-stage remains the non-TPU/oracle path."""
    f32 = jnp.float32
    bmax = (n - 2) // w
    if pallas:
        from .pallas_eval import fused_lower_index

        # leaders + sentinel so the kernel's [0, len-2] clamp can reach
        # the final block
        big = jnp.asarray(jnp.finfo(kp.dtype).max, kp.dtype)
        leaders = jnp.concatenate([kp[: c * w : w], big[None]])
        assert _plan(leaders.shape[0]) is not None
        blk = fused_lower_index(leaders, q, interpret=interpret)
        return jnp.minimum(blk, bmax)
    # level 1: first knot of each super-block (skip the 0th: count<=q of
    # later supers gives the super index directly)
    l1 = kp[c2 * w :: c2 * w][: c1 - 1]  # (C1-1,)
    s = jnp.sum(
        (l1[None, :] <= q[:, None]).astype(f32), axis=1
    )  # (Q,) in [0, C1-1]
    # level 2: fetch this super's C2 sub-leaders exactly via one-hot MXU
    l2 = kp[: c1 * c2 * w : w].reshape(c1, c2)  # first knot of each block
    iota = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], c1), 1)
    oh = (iota == s.astype(jnp.int32)[:, None]).astype(jnp.bfloat16)
    h, m, lo = _split3(l2)
    sub = (
        jnp.dot(oh, h, preferred_element_type=f32)
        + jnp.dot(oh, m, preferred_element_type=f32)
        + jnp.dot(oh, lo, preferred_element_type=f32)
    )  # (Q, C2) this super's block leaders, bit-exact f32
    cnt = jnp.sum((sub <= q[:, None]).astype(f32), axis=1)
    block = s * float(c2) + jnp.maximum(cnt, 1.0) - 1.0
    return jnp.minimum(block, float(bmax)).astype(jnp.int32)


def _pack_rows(kp, data, a, b, w, c):
    """Packed per-block rows ``(C, 4W+2 -> pad 8)``; data/a/b are 1-D."""
    n = data.shape[0]
    total = c * w + 1
    dp = jnp.concatenate([data, jnp.zeros((total - n,), data.dtype)])
    ap = jnp.concatenate([a, jnp.zeros((c * w - (n - 1),), a.dtype)])
    bp = jnp.concatenate([b, jnp.zeros((c * w - (n - 1),), b.dtype)])
    idx = jnp.arange(w + 1)[None, :] + w * jnp.arange(c)[:, None]
    rows = jnp.concatenate(
        [
            kp[: c * w + 1][idx],  # (C, W+1) knots
            dp[idx],  # (C, W+1) data
            ap.reshape(c, w),
            bp.reshape(c, w),
        ],
        axis=1,
    )  # (C, 4W+2)
    ch = rows.shape[1]
    pad = -(-ch // 8) * 8 - ch
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    return rows


def _window_refine(kwin, block, q, n, w):
    """Shared in-window refine: fine count, ``get_lower_index`` clamp,
    one-hot select of both knot endpoints.  kwin: gathered (Q, >=W+1)
    knot windows.  Returns (idx f32, ohl mask, x_l, x_r)."""
    f32 = jnp.float32
    qe = q[:, None]
    fine = jnp.sum((kwin[:, :w] <= qe).astype(f32), axis=1)
    pred = block.astype(f32) * float(w) + fine - 1.0
    idx = jnp.clip(pred, 0.0, float(n - 2))
    pos = idx - block.astype(f32) * float(w)  # in [0, W)
    iota = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], w), 1)
    ohl = (iota == pos.astype(jnp.int32)[:, None]).astype(f32)
    x_l = jnp.sum(kwin[:, :w] * ohl, axis=1)
    x_r = jnp.sum(kwin[:, 1 : w + 1] * ohl, axis=1)
    return idx, ohl, x_l, x_r


def _refine_windows(kwin, dwin, awin, bwin, block, q, n, w):
    """Window select + Hermite on extracted window slices (XLA)."""
    f32 = jnp.float32
    idx, ohl, x_l, x_r = _window_refine(kwin, block, q, n, w)
    y_l = jnp.sum(dwin[:, :w] * ohl, axis=1)
    y_r = jnp.sum(dwin[:, 1 : w + 1] * ohl, axis=1)
    a = jnp.sum(awin * ohl, axis=1)
    b = jnp.sum(bwin * ohl, axis=1)
    t = (q - x_l) / (x_r - x_l)
    one = f32(1.0)
    base = (one - t) * y_l + t * y_r + t * (one - t) * (a * (one - t) + b * t)
    lin_inf = jnp.isinf(t) & (a == 0) & (b == 0)
    out = jnp.where(lin_inf, y_l + t * (y_r - y_l), base)
    return idx.astype(jnp.int32), t, out


def _refine_and_eval(rows, block, q, n, w):
    """Window select + Hermite on gathered rows (XLA, exact op order)."""
    w1 = w + 1
    return _refine_windows(
        rows[:, :w1],
        rows[:, w1 : 2 * w1],
        rows[:, 2 * w1 : 2 * w1 + w],
        rows[:, 2 * w1 + w : 2 * w1 + 2 * w],
        block, q, n, w,
    )


def _refine_and_eval_aligned(rows, block, q, n, w):
    """XLA refine on the 32-lane-aligned (Q, 128) row layout."""
    w1 = w + 1
    return _refine_windows(
        rows[:, :w1],
        rows[:, _SEC : _SEC + w1],
        rows[:, 2 * _SEC : 2 * _SEC + w],
        rows[:, 3 * _SEC : 3 * _SEC + w],
        block, q, n, w,
    )


def can_use_big(x, data):
    return (
        x.dtype == jnp.float32
        and data.dtype == jnp.float32
        and data.ndim == 1
        and 65536 < x.shape[0] <= MAX_BIG_KNOTS
    )


def _big_eval_impl(knots, data, a, b, q, interpret=False, pallas=True):
    n = knots.shape[0]
    w, c, c1, c2 = _geometry(n)
    kp = _pad_knots(knots, w, c1, c2)
    block = _block_of(kp, n, w, c, c1, c2, q, interpret=interpret, pallas=pallas)
    # NOTE round-3 negative result (see _refine_and_eval_mosaic): a
    # Mosaic refine tail on 128-lane-aligned rows measured 15.5 ms vs
    # 12.1 ms for this XLA refine on NS1b — the kernel's 7 cross-lane
    # reduces per query cost more than the XLA selects' restreams save.
    rows = jnp.take(_pack_rows(kp, data, a, b, w, c), block, axis=0)
    _, _, out = _refine_and_eval(rows, block, q, n, w)
    return out


@jax.custom_vjp
def big_eval_1d(knots, data, a, b, q):
    """Hermite evaluation for n > 64k knots, scalar trailing dims.

    Backward = VJP of the gather formulation (``pallas_eval._eval_xla``)
    — the search stages are non-differentiable index computations."""
    return _big_eval_impl(knots, data, a, b, q)


def _be_fwd(knots, data, a, b, q):
    return _big_eval_impl(knots, data, a, b, q), (knots, data, a, b, q)


def _be_bwd(res, g):
    from .pallas_eval import _eval_xla, make_interval_table

    knots, data, a, b, q = res

    def form(knots, data, a, b, q):
        return _eval_xla(knots, make_interval_table(knots, data, a, b), q)

    _, vjp = jax.vjp(form, knots, data, a, b, q)
    return vjp(g)


big_eval_1d.defvjp(_be_fwd, _be_bwd)


def big_lower_index_frac(knots, q, interpret=False, pallas=True):
    """(idx, t) for n > 64k: block search + a knots-only row gather.

    Feeds the banked gather route; int/frac only (differentiate through
    the caller's own formulation, as with ``fused_index_frac``)."""
    n = knots.shape[0]
    w, c, c1, c2 = _geometry(n)
    kp = _pad_knots(knots, w, c1, c2)
    block = _block_of(kp, n, w, c, c1, c2, q, interpret=interpret, pallas=pallas)
    idxg = jnp.arange(w + 1)[None, :] + w * jnp.arange(c)[:, None]
    krows = kp[: c * w + 1][idxg]  # (C, W+1)
    pad = -(-(w + 1) // 8) * 8 - (w + 1)
    if pad:
        krows = jnp.pad(krows, ((0, 0), (0, pad)))
    rows = jnp.take(krows, block, axis=0)
    idx, _, x_l, x_r = _window_refine(rows[:, : w + 1], block, q, n, w)
    return idx.astype(jnp.int32), (q - x_l) / (x_r - x_l)


# -- Mosaic refine tail: a round-3 NEGATIVE RESULT, kept as the record --------
#
# Hypothesis: the XLA refine re-streams the gathered block rows once per
# select (the gather-fusion boundary, docs/ROADMAP.md) — ~4 ms of the
# 12 ms NS1b total — so a Mosaic kernel doing the fine count, one-hot
# selects, and Hermite in ONE stream of 128-lane-aligned rows should
# save most of it.  Measured on chip (262k knots, 1M queries):
# **15.5 ms vs 12.1 ms — SLOWER.**  The kernel's 7 cross-lane reduces
# per query (fine count + 6 picks, each a full 128-lane reduction with
# relayouts) cost more than the XLA selects' extra restreams; same
# conclusion family as the round-2 streaming-tail results.  The kernel
# stays here bit-exact (verified on chip) with interpret-mode tests as
# the record; production dispatch uses the XLA refine.

_SEC = 32  # lanes per section in the aligned layout (W = 16 tier)


def _pack_rows_aligned(kp, data, a, b, w, c):
    """(C, 128) rows with 32-lane-aligned sections; W must be 16."""
    assert w == 16, w
    n = data.shape[0]
    total = c * w + 1
    dp = jnp.concatenate([data, jnp.zeros((total - n,), data.dtype)])
    ap = jnp.concatenate([a, jnp.zeros((c * w - (n - 1),), a.dtype)])
    bp = jnp.concatenate([b, jnp.zeros((c * w - (n - 1),), b.dtype)])
    idx = jnp.arange(w + 1)[None, :] + w * jnp.arange(c)[:, None]

    def sec(v):
        return jnp.pad(v, ((0, 0), (0, _SEC - v.shape[1])))

    return jnp.concatenate(
        [
            sec(kp[: c * w + 1][idx]),
            sec(dp[idx]),
            sec(ap.reshape(c, w)),
            sec(bp.reshape(c, w)),
        ],
        axis=1,
    )  # (C, 128)


def _refine_kernel(rows_ref, blk_ref, q_ref, out_ref, *, n, w):
    import jax as _jax

    f32 = jnp.float32
    rows = rows_ref[:]  # (B, 128)
    blk = blk_ref[:]  # (B, 1) f32
    q = q_ref[:]  # (B, 1)
    lane = _jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    # fine count over the window's first W knots (reference clamp); the
    # lane mask also excludes the zero-padded section lanes
    fine = jnp.sum(
        jnp.where((rows <= q) & (lane < w), f32(1.0), f32(0.0)),
        axis=1,
        keepdims=True,
    )
    pred = blk * float(w) + fine - 1.0
    idx = jnp.clip(pred, 0.0, float(n - 2))
    pos = (idx - blk * float(w)).astype(jnp.int32)  # in [0, W)

    def pick(offset, p):
        oh = (lane == p + offset).astype(f32)
        return jnp.sum(rows * oh, axis=1, keepdims=True)

    x_l = pick(0, pos)
    x_r = pick(0, pos + 1)
    y_l = pick(_SEC, pos)
    y_r = pick(_SEC, pos + 1)
    a = pick(2 * _SEC, pos)
    b = pick(3 * _SEC, pos)
    t = (q - x_l) / (x_r - x_l)
    one = f32(1.0)
    base = (one - t) * y_l + t * y_r + t * (one - t) * (a * (one - t) + b * t)
    lin_inf = jnp.isinf(t) & (a == 0) & (b == 0)
    out_ref[:] = jnp.where(lin_inf, y_l + t * (y_r - y_l), base)


def _refine_and_eval_mosaic(rows, block, q, n, w, interpret=False):
    """Mosaic refine tail on aligned (Q, 128) gathered rows (W=16)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nq = q.shape[0]
    bq = 512
    npad = -(-nq // bq) * bq - nq
    if npad:
        rows = jnp.pad(rows, ((0, npad), (0, 0)))
        block = jnp.pad(block, (0, npad))
        q = jnp.pad(q, (0, npad))
    m = q.shape[0]
    nb = m // bq
    out = pl.pallas_call(
        functools.partial(_refine_kernel, n=n, w=w),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
        interpret=interpret,
    )(rows, block.astype(jnp.float32).reshape(m, 1), q.reshape(m, 1))
    return out.reshape(m)[:nq]
