"""Fused Pallas evaluation kernel: bucketize → gather → polynomial.

This is the TPU-native rewrite of the reference's per-query hot path
(searchsorted ``vector_extensions.rs:55-111`` + 2-point/4-value gather +
``calc_frac``/Hermite evaluation, ``linear.rs:73-98`` /
``cubic_spline.rs:791-830``) as ONE kernel: queries stream through VMEM,
and knots/interval tables stay VMEM-resident the whole time.

Why not gathers?  A TPU has no efficient arbitrary gather across >128
lanes; XLA lowers ``table[idx]`` to slow scalar loads, and a flat
compare-against-all-knots bucketize costs O(n) VPU ops per query (the
whole-axis comparison network measured ~9 ms for 1M × 2048 on v5e).  The
kernel instead uses a **two-level windowed search** that is exact for any
strictly-rising axis:

1. coarse: compare q against the C-1 block-leader knots → block index c
   (O(C) compares);
2. fetch block c's knot and data windows (W+1 overlapping rows each, so
   both interval endpoints select from one fetch) plus its W [a, b]
   interval rows with a one-hot matmul on the MXU — the one-hot (C, B)
   times the blocked tables — turning the gather into systolic-array work;
3. fine: compare q against the W in-window knots → position within the
   block (O(W) compares), then select the interval endpoints and
   coefficients by mask+reduce.

Total per-query cost is O(C + W) VPU ops + O(n·4) MACs instead of
O(n) comparisons, with ``C·W = n_padded``.  The clamp-to-``[0, n-2]``
out-of-range semantics of ``get_lower_index`` are preserved exactly
(including ±inf; NaN queries produce NaN output).

Numerics: everything is f32; the one-hot matmul multiplies by exact 0/1
so row selection is bit-exact — the tables ride the MXU as an exact
3-way bf16 truncation split (see ``_split3``), which reproduces the f32
values bit-for-bit in half the passes of a ``Precision.HIGHEST`` f32
matmul — and the polynomial uses the same operation order as the XLA
path.  **Requires finite table values**: a NaN/inf datum anywhere in the
table poisons every query's selection (``NaN * 0 == NaN`` on the MXU),
unlike the gather formulation which localizes it to adjacent intervals.
The strategies route non-finite banks to the gather path via the
``finite`` hint set by the eager builder (docs/PARITY.md D5).

Gradients: the kernel defines a ``custom_vjp`` whose backward pass is the
VJP of the equivalent XLA formulation, so ``jax.grad`` through an
interpolator works regardless of which path evaluated the primal.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _plan(n: int):
    """Choose (W, C, B): window size, block count, and query lanes per grid
    step.  Returns None beyond ~64k knots.

    B maximizes lanes per grid step under the VMEM budget: the query-side
    buffers cost ~``6C + 36W`` bytes per lane (the (C, B) compare/one-hot
    tensors and the (ch·W, B) fetched window dominate), and fewer, larger
    grid steps amortize per-step overhead (measured +7% going 2048→8192 at
    2k knots on v5e).  W trades the fine/select row count and MXU
    K-utilization (K = C; 128 is a full pass) against the coarse compare
    count (C-1 rows): W=16 at 2k knots measured 16% faster than W=32,
    W=8 markedly slower."""
    if n <= 2048:
        w = 16
    elif n <= 8192:
        w = 32
    elif n <= 16384:
        w = 64
    elif n <= 65536:
        w = 128
    else:
        return None
    c = max(2, math.ceil(n / w))
    per_lane = 6 * c + 36 * w
    b = 512
    while b < 8192 and 2 * b * per_lane <= 13_400_000:
        b *= 2
    return w, c, b


def _split3(x):
    """Exact 3-way bf16 split: ``x == hi + mid + lo`` bit-for-bit.

    Truncation (round-toward-zero) splitting puts f32 mantissa bits 1-8,
    9-16, 17-24 into three non-overlapping bf16 terms, so each residual is
    exactly representable and the f32 re-sum reconstructs ``x`` exactly.
    Three default-precision bf16 MXU passes against an exactly-bf16 one-hot
    then equal one ``Precision.HIGHEST`` f32 matmul (six passes) bit-for-bit
    at half the MXU cost (measured +23% kernel throughput on v5e)."""
    f32 = jnp.float32
    mask = jnp.int32(-65536)  # 0xFFFF0000: keep sign+exponent+7 mantissa bits
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.int32) & mask, f32
    )
    r1 = x - hi
    mid = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(r1, jnp.int32) & mask, f32
    )
    r2 = r1 - mid
    return hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), r2.astype(
        jnp.bfloat16
    )


def _dot3(hi, mid, lo, oh):
    """f32-exact one-hot gather as three bf16 MXU passes (see _split3)."""
    f32 = jnp.float32
    acc = jnp.dot(hi, oh, preferred_element_type=f32)
    acc = acc + jnp.dot(mid, oh, preferred_element_type=f32)
    return acc + jnp.dot(lo, oh, preferred_element_type=f32)


def _kernel(lead_ref, th_ref, tm_ref, tl_ref, q_ref, out_ref,
            *, n, w, c, p0):
    """Round-5 kernel body.  The glue-corrected stage anatomy of the
    round-4 shape (benches/ablate_ns1_stages.py, NS1 workload: 0.805 ms
    = DMA/harness floor 0.26 + coarse 0.12 + MXU fetch 0.40 + fine 0.01
    + selects 0.07 + tail 0.04, with ~0.09 of VPU already overlapped
    under the MXU by Mosaic's cross-step scheduling) showed the fetch
    running at ~100% MXU utilization *for its row count* — 96 rows of
    which only 66 were useful (the W+1 knot/data windows were padded to
    Wp = 32 sublanes each).  This body keeps the round-4 search
    structure (iota one-hot + numeric clamp: the adjacent-difference
    one-hot and the fetched-pmax clamp both measured SLOWER — +0.11 ms
    of bf16 concat relayouts and no win over the coarse sum — see
    docs/ROADMAP.md round-5 NS1 notes) but fetches the tight operand:
    [x window (W+1) | pad | a (W) | b (W) | data window (W+1)] with
    8-aligned section starts, 73 rows at W=16.  Measured 0.79 vs
    0.81 ms on NS1; bit-exactness vs the XLA formulation unchanged.
    """
    f32 = jnp.float32
    q = q_ref[:]  # (1, B)

    # 1. coarse: count block leaders <= q  → block index, clamped so the
    #    final interval row (n-2) is always inside the chosen window.
    cmp1 = (lead_ref[:] <= q).astype(f32)  # (C-1, B)
    coarse = jnp.sum(cmp1, axis=0, keepdims=True)  # (1, B)
    cmax = float((n - 2) // w)
    cidx = jnp.minimum(coarse, cmax)  # (1, B) f32

    # 2. one-hot over blocks → window fetch on the MXU.  The one-hot is
    #    exactly bf16-representable, and the split tables reconstruct the
    #    f32 values bit-exactly (selection must be exact — the x endpoints
    #    especially feed a catastrophic cancellation in t).  The knot and
    #    data windows carry W+1 overlapping rows so both interval endpoints
    #    come from the same fetch; only [a, b] need per-interval channels.
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, q.shape[1]), 0)
    oh1 = (iota_c == cidx.astype(jnp.int32)).astype(jnp.bfloat16)  # (C, B)
    win = _dot3(th_ref[:], tm_ref[:], tl_ref[:], oh1)  # (P0+3W+1, B)
    win_x = win[: w + 1]
    win_a = win[p0 : p0 + w]
    win_b = win[p0 + w : p0 + 2 * w]
    win_d = win[p0 + 2 * w : p0 + 3 * w + 1]

    # 3. fine: position within the window (first W rows are this block's
    #    knots; row W duplicates the next block's leader), reference clamp
    fine = jnp.sum((win_x[:w] <= q).astype(f32), axis=0, keepdims=True)
    pred = cidx * float(w) + fine - 1.0
    pos = jnp.clip(pred, 0.0, float(n - 2)) - cidx * float(w)  # in [0, W)

    # One W-row mask selects everything: pos < W always, and the right
    # endpoint is the shifted window against the SAME mask
    # (win[pos+1] == shift(win)[pos]) — no second mask, W-row reduces.
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, q.shape[1]), 0)
    oh_l = (iota_w == pos.astype(jnp.int32)).astype(f32)  # (W, B)
    x_l = jnp.sum(win_x[:w] * oh_l, axis=0, keepdims=True)
    x_r = jnp.sum(win_x[1 : w + 1] * oh_l, axis=0, keepdims=True)
    y_l = jnp.sum(win_d[:w] * oh_l, axis=0, keepdims=True)
    y_r = jnp.sum(win_d[1 : w + 1] * oh_l, axis=0, keepdims=True)
    a = jnp.sum(win_a * oh_l, axis=0, keepdims=True)
    b = jnp.sum(win_b * oh_l, axis=0, keepdims=True)

    t = (q - x_l) / (x_r - x_l)
    one = f32(1.0)
    # same op order as cubic_spline.rs:818-828 (linear is encoded with
    # a = b = 0, which reduces to the lerp exactly)
    base = (one - t) * y_l + t * y_r + t * (one - t) * (a * (one - t) + b * t)
    # ±inf queries on *linear* tables must extrapolate to ±inf like the
    # reference's calc_frac (linear.rs:29-37); the symmetric lerp above
    # hits inf-inf → NaN there.  Finite t keeps `base` bit-exactly.
    lin_inf = jnp.isinf(t) & (a == f32(0.0)) & (b == f32(0.0))
    out_ref[:] = jnp.where(lin_inf, y_l + t * (y_r - y_l), base)


def _pack_tables(knots, tbl, w, c):
    """Blocked, transposed operands for the index kernel (trace-time)."""
    n = knots.shape[0]
    ch = tbl.shape[1]
    # Pad with the largest *finite* value: +inf would turn into NaN in the
    # one-hot matmul (inf * 0).  Queries above this sentinel clamp to the
    # last interval anyway, which is the reference's OOB semantics.
    big = jnp.asarray(jnp.finfo(knots.dtype).max, knots.dtype)
    kp = jnp.concatenate([knots, jnp.full((w * c - n,), big, knots.dtype)])
    # leaders: knots[w], knots[2w], ... knots[(c-1)w]
    lead = kp[w::w].reshape(c - 1, 1)
    kblk = kp.reshape(c, w).T  # (W, C)
    tp = jnp.concatenate(
        [tbl, jnp.zeros((w * c - (n - 1), ch), tbl.dtype)], axis=0
    )
    # (C, W, ch) → (ch, W, C) → (ch*W, C), row s = c_i*W + w_i
    tblk = tp.reshape(c, w, ch).transpose(2, 1, 0).reshape(ch * w, c)
    return lead, kblk, tblk


def _pack_windows(knots, data, a, b, w, c, wp, pad=None):
    """Overlapping-window operands for the eval kernel (trace-time).

    Column j of kwin/dwin holds values ``[j*w : j*w + w + 1]`` padded to
    ``wp`` rows (bf16 sublane alignment), so the W+1-th row is the next
    block's leader and both interval endpoints select from one window.
    ``abblk`` stacks the per-interval [a; b] channels as (2W, C).
    ``pad`` overrides the out-of-range knot sentinel (default: largest
    finite value; the double-float kernel pads its *lo* halves with 0)."""
    n = knots.shape[0]
    big = jnp.asarray(
        jnp.finfo(knots.dtype).max if pad is None else pad, knots.dtype
    )
    kp = jnp.concatenate(
        [knots, jnp.full((w * c + 1 - n,), big, knots.dtype)]
    )
    dp = jnp.concatenate([data, jnp.zeros((w * c + 1 - n,), data.dtype)])
    lead = kp[w::w][: c - 1].reshape(c - 1, 1)
    idx = jnp.arange(wp)[:, None] + w * jnp.arange(c)[None, :]
    idx = jnp.minimum(idx, w * c)  # rows beyond W+1 replicate the edge
    kwin = kp[idx]  # (Wp, C)
    dwin = dp[idx]
    ap = jnp.concatenate([a, jnp.zeros((w * c - (n - 1),), a.dtype)])
    bp = jnp.concatenate([b, jnp.zeros((w * c - (n - 1),), b.dtype)])
    abblk = jnp.concatenate(
        [ap.reshape(c, w).T, bp.reshape(c, w).T], axis=0
    )  # (2W, C)
    return lead, kwin, dwin, abblk


def _pack_tall(knots, data, a, b, w, c):
    """Round-5 tall operand for the eval kernel (trace-time).

    Layout (section starts 8-aligned so the f32 result's slices stay on
    sublane-tile boundaries): x window (W+1, column j = knots
    ``[j*w : j*w + w + 1]``) at row 0, zero pad to ``p0 = roundup(W+2,
    8)``, a (W) at p0, b (W) at p0+W, data window (W+1) at p0+2W —
    P0 + 3W + 1 rows (73 at W=16) vs the round-4 layout's 2·Wp + 2W
    (96): the MXU fetch runs at ~100% utilization for its row count
    (benches/ablate_ns1_stages.py), so operand rows are milliseconds.
    Out-of-range knot rows pad with the largest finite value (+inf
    would turn into NaN in the one-hot matmul); queries above the
    sentinel clamp to the last interval, the reference's OOB semantics
    (the kernel's numeric ``min(coarse, cmax)`` also caps +inf/sentinel
    queries — a trace-time sentinel cap alone would miscount q = +inf,
    measured as a NaN escape in round 5)."""
    n = knots.shape[0]
    big = jnp.asarray(jnp.finfo(knots.dtype).max, knots.dtype)
    kp = jnp.concatenate(
        [knots, jnp.full((w * c + 1 - n,), big, knots.dtype)]
    )
    dp = jnp.concatenate([data, jnp.zeros((w * c + 1 - n,), data.dtype)])
    lead = kp[w::w][: c - 1].reshape(c - 1, 1)
    idx = jnp.arange(w + 1)[:, None] + w * jnp.arange(c)[None, :]
    idx = jnp.minimum(idx, w * c)
    kwin = kp[idx]  # (W+1, C)
    dwin = dp[idx]
    ap = jnp.concatenate([a, jnp.zeros((w * c - (n - 1),), a.dtype)])
    bp = jnp.concatenate([b, jnp.zeros((w * c - (n - 1),), b.dtype)])
    p0 = -(-(w + 2) // 8) * 8
    pad = jnp.zeros((p0 - (w + 1), c), knots.dtype)
    tall = jnp.concatenate(
        [kwin, pad, ap.reshape(c, w).T, bp.reshape(c, w).T, dwin], axis=0
    )
    return lead, tall


def _eval_xla(knots, tbl, q):
    """Equivalent XLA formulation (correctness oracle + VJP + fallback)."""
    from .searchsorted import get_lower_index

    idx = get_lower_index(knots, q)  # platform-aware method choice
    rows = tbl[idx]
    x_l, x_r, y_l, y_r, a, b = (rows[..., i] for i in range(6))
    t = (q - x_l) / (x_r - x_l)
    base = (1 - t) * y_l + t * y_r + t * (1 - t) * (a * (1 - t) + b * t)
    lin_inf = jnp.isinf(t) & (a == 0) & (b == 0)
    return jnp.where(lin_inf, y_l + t * (y_r - y_l), base)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_eval_1d(knots, tbl, q):
    """Evaluate the piecewise-cubic (Hermite symmetric form) defined by
    ``tbl[:, :6] = [x_l, x_r, y_l, y_r, a, b]`` at flat queries ``q``.

    f32 only, scalar trailing dims.  ``tbl`` may have >=6 channels (extra
    channels are padding for lane alignment).  Under a mesh the query axis
    partitions with zero communication (``ops/partition.py``); under
    ``vmap`` batched queries flatten into the query axis.
    """
    return _fused_eval_sharded(knots, tbl, q)


def _fused_eval_sharded(knots, tbl, q, interpret=False):
    from .partition import sharded_fused_eval

    return sharded_fused_eval(bool(interpret))(knots, tbl, q)


def _fused_eval_impl(knots, tbl, q, interpret=False):
    n = knots.shape[0]
    nq = q.shape[0]
    w, c, B = _plan(n)
    # The interval table's endpoint channels are redundant with the knot /
    # data vectors; recover them so the kernel fetches the small windows
    # plus only the [a, b] channels (XLA dead-code-eliminates the stack).
    data = jnp.concatenate([tbl[:, 2], tbl[-1:, 3]])
    a, b = tbl[:, 4], tbl[:, 5]

    lead, tall = _pack_tall(knots, data, a, b, w, c)  # (P0+3W+1, C)
    th, tm, tl = _split3(tall)

    nb = (nq + B - 1) // B
    qpad = jnp.pad(q, (0, nb * B - nq)).reshape(1, nb * B)

    p0 = -(-(w + 2) // 8) * 8
    rows = p0 + 3 * w + 1
    kern = functools.partial(_kernel, n=n, w=w, c=c, p0=p0)
    fix = lambda i: (0, 0)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((c - 1, 1), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nb * B), jnp.float32),
        interpret=interpret,
    )(lead, th, tm, tl, qpad)
    return out.reshape(nb * B)[:nq]


def _fused_fwd(knots, tbl, q):
    return _fused_eval_sharded(knots, tbl, q), (knots, tbl, q)


def _fused_bwd(res, g):
    knots, tbl, q = res
    _, vjp = jax.vjp(_eval_xla, knots, tbl, q)
    return vjp(g)


fused_eval_1d.defvjp(_fused_fwd, _fused_bwd)


def _index_kernel(lead_ref, kh_ref, km_ref, kl_ref, q_ref, out_ref, *, n, w, c):
    """Bucketize-only variant: the two-level windowed search emitting the
    clamped interval index (int32) — used where the value fetch is cheaper
    in XLA (e.g. the 2-D quad-row gather) but the searchsorted is not."""
    f32 = jnp.float32
    q = q_ref[:]
    cmp1 = (lead_ref[:] <= q).astype(f32)
    coarse = jnp.sum(cmp1, axis=0, keepdims=True)
    cmax = float((n - 2) // w)
    cidx = jnp.minimum(coarse, cmax)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, q.shape[1]), 0)
    oh1 = (iota_c == cidx.astype(jnp.int32)).astype(jnp.bfloat16)
    win_x = _dot3(kh_ref[:], km_ref[:], kl_ref[:], oh1)
    fine = jnp.sum((win_x <= q).astype(f32), axis=0, keepdims=True)
    pred = cidx * float(w) + fine - 1.0
    out_ref[:] = jnp.clip(pred, 0.0, float(n - 2)).astype(jnp.int32)


def fused_lower_index(knots, q, interpret=False):
    """Pallas two-level ``get_lower_index`` for f32 axes (same clamp
    semantics); ~4x the throughput of the flat compare-and-count at
    512-knot axes."""
    n = knots.shape[0]
    nq = q.shape[0]
    w, c, B = _plan(n)
    lead, kblk, _ = _pack_tables(knots, jnp.zeros((n - 1, 1), knots.dtype), w, c)
    kh, km, kl = _split3(kblk)
    nb = (nq + B - 1) // B
    qpad = jnp.pad(q, (0, nb * B - nq)).reshape(1, nb * B)
    kern = functools.partial(_index_kernel, n=n, w=w, c=c)
    fix = lambda i: (0, 0)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((c - 1, 1), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nb * B), jnp.int32),
        interpret=interpret,
    )(lead, kh, km, kl, qpad)
    return out.reshape(nb * B)[:nq]


def _frac_kernel(lead_ref, kh_ref, km_ref, kl_ref, q_ref, idx_ref, t_ref,
                 *, n, w, c, wp):
    """Bucketize + interpolation fraction in one pass: the windowed
    search already selects both interval endpoints, so emitting
    ``t = (q - x_l) / (x_r - x_l)`` is free — saving the XLA paths two
    1-row-per-query ``x[idx]`` gathers (~6 ns/row each on v5e)."""
    q = q_ref[:]
    idx, x_l, x_r = _axis_search(
        lead_ref[:], kh_ref[:], km_ref[:], kl_ref[:], q,
        n=n, w=w, c=c, wp=wp,
    )
    idx_ref[:] = idx.astype(jnp.int32)
    t_ref[:] = (q - x_l) / (x_r - x_l)


@jax.custom_vjp
def fused_index_frac(knots, q):
    """Pallas ``(get_lower_index(q), t)`` for f32 axes; the fraction uses
    the same operand order as the reference eval paths
    (``cubic_spline.rs:818`` / ``linear.rs:29-37`` via calc_frac).

    ``t`` is differentiable (the index is integer/non-diff); the backward
    pass is the VJP of the XLA formulation with the interval fixed.
    Under a mesh the query axis partitions with zero communication
    (``partition.sharded_index_frac`` — same inversion as
    ``fused_eval_1d``); under ``vmap`` batched queries flatten."""
    return _index_frac_sharded(knots, q)


def _index_frac_sharded(knots, q, interpret=False):
    from .partition import sharded_index_frac

    return sharded_index_frac(bool(interpret))(knots, q)


def _index_frac_fwd(knots, q):
    idx, t = _index_frac_sharded(knots, q)
    return (idx, t), (knots, q, idx)


def _index_frac_bwd(res, cts):
    knots, q, idx = res
    _, g_t = cts  # idx cotangent is symbolically zero (int output)

    def frac(knots, q):
        x_l = knots[idx]
        x_r = knots[idx + 1]
        return (q - x_l) / (x_r - x_l)

    _, vjp = jax.vjp(frac, knots, q)
    return vjp(g_t)


fused_index_frac.defvjp(_index_frac_fwd, _index_frac_bwd)


def _index_frac_impl(knots, q, interpret=False):
    n = knots.shape[0]
    nq = q.shape[0]
    w, c, B = _plan(n)
    wp = -(-(w + 1) // 16) * 16
    zeros = jnp.zeros((n - 1,), knots.dtype)
    lead, kwin, _, _ = _pack_windows(knots, knots, zeros, zeros, w, c, wp)
    kh, km, kl = _split3(kwin)
    nb = (nq + B - 1) // B
    qpad = jnp.pad(q, (0, nb * B - nq)).reshape(1, nb * B)
    kern = functools.partial(_frac_kernel, n=n, w=w, c=c, wp=wp)
    fix = lambda i: (0, 0)
    mov = lambda i: (0, i)
    idx, t = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((c - 1, 1), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, nb * B), jnp.int32),
            jax.ShapeDtypeStruct((1, nb * B), jnp.float32),
        ],
        interpret=interpret,
    )(lead, kh, km, kl, qpad)
    return idx.reshape(nb * B)[:nq], t.reshape(nb * B)[:nq]


def _axis_search(lead, kh, km, kl, q, *, n, w, c, wp):
    """Shared in-kernel two-level search: returns the clamped interval
    index (f32), and the interval endpoints selected from the window."""
    f32 = jnp.float32
    cmp1 = (lead <= q).astype(f32)
    coarse = jnp.sum(cmp1, axis=0, keepdims=True)
    cmax = float((n - 2) // w)
    cidx = jnp.minimum(coarse, cmax)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, q.shape[1]), 0)
    oh1 = (iota_c == cidx.astype(jnp.int32)).astype(jnp.bfloat16)
    win = _dot3(kh, km, kl, oh1)  # (Wp, B)
    fine = jnp.sum((win[:w] <= q).astype(f32), axis=0, keepdims=True)
    pred = cidx * float(w) + fine - 1.0
    idx = jnp.clip(pred, 0.0, float(n - 2))
    pos = idx - cidx * float(w)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, q.shape[1]), 0)
    oh_l = (iota_w == pos.astype(jnp.int32)).astype(f32)
    x_l = jnp.sum(win[:w] * oh_l, axis=0, keepdims=True)
    x_r = jnp.sum(win[1 : w + 1] * oh_l, axis=0, keepdims=True)
    return idx, x_l, x_r


def _cell_kernel(xl_ref, xh_ref, xm_ref, xlo_ref, yl_ref, yh_ref, ym_ref,
                 ylo_ref, qx_ref, qy_ref, cell_ref, tx_ref, ty_ref, *,
                 nx, wx, cx, wpx, ny, wy, cy, wpy):
    """Both bilinear axis searches in one pass: emits the flat cell index
    ``xi * (ny - 1) + yi`` plus the interpolation fractions tx, ty."""
    qx = qx_ref[:]
    qy = qy_ref[:]
    xi, x_l, x_r = _axis_search(
        xl_ref[:], xh_ref[:], xm_ref[:], xlo_ref[:], qx,
        n=nx, w=wx, c=cx, wp=wpx,
    )
    yi, y_l, y_r = _axis_search(
        yl_ref[:], yh_ref[:], ym_ref[:], ylo_ref[:], qy,
        n=ny, w=wy, c=cy, wp=wpy,
    )
    # xi, yi < 2^23: the f32 product is exact for every real grid size
    cell_ref[:] = (xi * float(ny - 1) + yi).astype(jnp.int32)
    tx_ref[:] = (qx - x_l) / (x_r - x_l)
    ty_ref[:] = (qy - y_l) / (y_r - y_l)


@jax.custom_vjp
def fused_cell_index(x, y, qx, qy):
    """Fused bilinear bucketize for f32 axes: one Pallas pass computing the
    flat cell index and both interpolation fractions
    (``/root/reference/src/interp2d/strategies/bilinear.rs:71-97``
    semantics; clamps match ``get_lower_index`` exactly, incl. ±inf).

    Feeds the bilinear gather route (``pallas_tail.bilinear_gathered_eval``)
    with the flat cell id; the fractions are differentiable, the cell is
    not (int), and the backward pass is the XLA formulation's VJP with
    the cell fixed."""
    return _cell_index_impl(x, y, qx, qy)


def _cell_index_fwd(x, y, qx, qy):
    cell, tx, ty = _cell_index_impl(x, y, qx, qy)
    return (cell, tx, ty), (x, y, qx, qy, cell)


def _cell_index_bwd(res, cts):
    x, y, qx, qy, cell = res
    _, g_tx, g_ty = cts

    ny1 = res[1].shape[0] - 1

    def fracs(x, y, qx, qy):
        xi = cell // ny1
        yi = cell - xi * ny1
        tx = (qx - x[xi]) / (x[xi + 1] - x[xi])
        ty = (qy - y[yi]) / (y[yi + 1] - y[yi])
        return tx, ty

    _, vjp = jax.vjp(fracs, x, y, qx, qy)
    return vjp((g_tx, g_ty))


fused_cell_index.defvjp(_cell_index_fwd, _cell_index_bwd)


def _cell_index_impl(x, y, qx, qy, interpret=False):
    nx, ny = x.shape[0], y.shape[0]
    nq = qx.shape[0]
    wx, cx, bx = _plan(nx)
    wy, cy, by = _plan(ny)
    B = min(bx, by)
    wpx = -(-(wx + 1) // 16) * 16
    wpy = -(-(wy + 1) // 16) * 16
    zx = jnp.zeros((nx - 1,), x.dtype)
    zy = jnp.zeros((ny - 1,), y.dtype)
    lead_x, kwin_x, _, _ = _pack_windows(x, x, zx, zx, wx, cx, wpx)
    lead_y, kwin_y, _, _ = _pack_windows(y, y, zy, zy, wy, cy, wpy)
    xh, xm, xlo = _split3(kwin_x)
    yh, ym, ylo = _split3(kwin_y)

    nb = (nq + B - 1) // B
    qxp = jnp.pad(qx, (0, nb * B - nq)).reshape(1, nb * B)
    qyp = jnp.pad(qy, (0, nb * B - nq)).reshape(1, nb * B)

    kern = functools.partial(
        _cell_kernel,
        nx=nx, wx=wx, cx=cx, wpx=wpx, ny=ny, wy=wy, cy=cy, wpy=wpy,
    )
    fix = lambda i: (0, 0)
    mov = lambda i: (0, i)
    cell, tx, ty = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((cx - 1, 1), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((wpx, cx), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((wpx, cx), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((wpx, cx), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((cy - 1, 1), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((wpy, cy), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((wpy, cy), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((wpy, cy), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, nb * B), jnp.int32),
            jax.ShapeDtypeStruct((1, nb * B), jnp.float32),
            jax.ShapeDtypeStruct((1, nb * B), jnp.float32),
        ],
        interpret=interpret,
    )(lead_x, xh, xm, xlo, lead_y, yh, ym, ylo, qxp, qyp)
    flat = lambda v: v.reshape(nb * B)[:nq]
    return flat(cell), flat(tx), flat(ty)


def make_interval_table(x, data, a=None, b=None):
    """Stack the per-interval channels ``[x_l, x_r, y_l, y_r, a, b]``.

    For linear strategies pass ``a = b = None`` (zeros), which makes the
    Hermite form collapse to the exact lerp.
    """
    zeros = jnp.zeros_like(data[:-1]) if a is None else a
    zerob = jnp.zeros_like(data[:-1]) if b is None else b
    return jnp.stack(
        [x[:-1], x[1:], data[:-1], data[1:], zeros, zerob], axis=-1
    )


def can_use_fused(x, data, extra=()):
    """Shape/dtype eligibility for the fused kernel (the platform is
    selected per lowering via ``lax.platform_dependent`` in the caller)."""
    arrays = (x, data) + tuple(extra)
    return (
        all(a.dtype == jnp.float32 for a in arrays)
        and data.ndim == 1
        and x.shape[0] >= 4
        and _plan(x.shape[0]) is not None
    )
