"""Double-float fused evaluation kernel: f64-grade accuracy on f32 TPUs.

Same two-level windowed search + select + Hermite structure as
``pallas_eval._kernel`` (reference semantics
``cubic_spline.rs:791-830`` / ``vector_extensions.rs:55-111``), but every
value — knots, data, [a, b] coefficients, queries, output — is a
double-float ``(hi, lo)`` f32 pair (``ops/df.py``), giving ~49 mantissa
bits end-to-end (~1e-13 max relative error vs the f64 oracle, measured)
on hardware whose native wide type stops at f32.

Cost vs the f32 kernel: the one-hot window fetch doubles (hi+lo tables,
18 bf16 MXU passes instead of 9), the select stage doubles (12 mask
reductions), and the polynomial tail goes from ~10 VPU ops to ~180
(error-free transforms).  Accuracy work therefore costs ~2-3x the f32
kernel (measured: see BASELINE.md).

Interval selection compares DF pairs lexicographically, so knots that are
*equal in f32 but distinct in f64* still select the correct interval —
bucketize decisions match the f64 oracle's, not f32-rounded ones.

Route map — what is SHIPPED vs what is a RECORD.  Shipped entry points
(what serving/partition dispatch to):

====================================  ==========================================
entry point                           route
====================================  ==========================================
``fused_eval_1d_df``                  1-D DF windowed kernel (<=64k knots);
                                      guarded-XLA twin ``eval_xla_df``
``fused_index_frac_df``               DF (idx, t) bucketize pass (shared)
``gathered_bank_eval_df[_packed]``    wide-bank DF: packed-row gather +
                                      ``banked_df_tail`` Mosaic kernel
``gathered_bilinear_eval_df[_packed]``2-D linear DF: ``bilinear_df_tail``
``gathered_bicubic_eval_df[_packed]`` 2-D cubic DF cell route, tail="mxu" →
                                      ``bicubic_df_tail_mxu`` (47.8 ms/1M NS3d);
                                      guarded-XLA fallback ``_df_bicubic_tail``
``gathered_bicubic_nodes_eval_df``    2-D cubic DF NODE route (memory-frugal):
                                      ``bicubic_df_node_tail`` (84.8 ms/1M)
====================================  ==========================================

RECORDS (measured-negative, kept with tests, not on any route):
``bicubic_df_tail`` as a Mosaic tail (67.2 ms — still shipped as the
guarded-XLA CPU tail), ``tail="nested"``/``tail="weight"`` dispatch
options, ``fetch="pair"`` on the node route (5,242.8 ms), and everything
in ``ops/df_records.py`` (the per-block weight-form tail family).  The
f32 record kernels live in ``ops/pallas_tail.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .df import (
    df_add,
    df_div,
    df_mul,
    df_neg,
    df_sub,
    fast_two_sum,
    two_prod,
    two_sum,
)
from .pallas_eval import _dot3, _pack_windows, _plan, _split3
from ..utils.hygiene import check_route_tables


def _select(win, oh_l, w):
    """Mask-reduce row select of both interval endpoints (exact: one-hot
    weights are 0/1)."""
    left = jnp.sum(win[:w] * oh_l, axis=0, keepdims=True)
    right = jnp.sum(win[1 : w + 1] * oh_l, axis=0, keepdims=True)
    return left, right


def _select_ab(win, oh_l, w):
    a = jnp.sum(win[:w] * oh_l, axis=0, keepdims=True)
    b = jnp.sum(win[w:] * oh_l, axis=0, keepdims=True)
    return a, b


def _df_kernel(
    leadh_ref, leadl_ref,
    kh1, kh2, kh3, kl1, kl2, kl3,
    dh1, dh2, dh3, dl1, dl2, dl3,
    ah1, ah2, ah3, al1, al2, al3,
    qh_ref, ql_ref, outh_ref, outl_ref, *, n, w, c, wp,
):
    from .df import no_guard

    with no_guard():  # Mosaic neither needs nor lowers the barriers
        _df_kernel_body(
            leadh_ref, leadl_ref,
            kh1, kh2, kh3, kl1, kl2, kl3,
            dh1, dh2, dh3, dl1, dl2, dl3,
            ah1, ah2, ah3, al1, al2, al3,
            qh_ref, ql_ref, outh_ref, outl_ref, n=n, w=w, c=c, wp=wp,
        )


def _df_kernel_body(
    leadh_ref, leadl_ref,
    kh1, kh2, kh3, kl1, kl2, kl3,
    dh1, dh2, dh3, dl1, dl2, dl3,
    ah1, ah2, ah3, al1, al2, al3,
    qh_ref, ql_ref, outh_ref, outl_ref, *, n, w, c, wp,
):
    f32 = jnp.float32
    qh = qh_ref[:]  # (1, B)
    ql = ql_ref[:]

    # 1. coarse: count block leaders <= q, DF lexicographic compare
    leadh = leadh_ref[:]
    leadl = leadl_ref[:]
    le1 = (leadh < qh) | ((leadh == qh) & (leadl <= ql))
    coarse = jnp.sum(le1.astype(f32), axis=0, keepdims=True)
    cmax = float((n - 2) // w)
    cidx = jnp.minimum(coarse, cmax)

    # 2. one-hot window fetch (hi and lo tables, both exact via _split3)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, qh.shape[1]), 0)
    oh1 = (iota_c == cidx.astype(jnp.int32)).astype(jnp.bfloat16)
    win_xh = _dot3(kh1[:], kh2[:], kh3[:], oh1)  # (Wp, B)
    win_xl = _dot3(kl1[:], kl2[:], kl3[:], oh1)
    win_dh = _dot3(dh1[:], dh2[:], dh3[:], oh1)
    win_dl = _dot3(dl1[:], dl2[:], dl3[:], oh1)
    win_abh = _dot3(ah1[:], ah2[:], ah3[:], oh1)  # (2W, B)
    win_abl = _dot3(al1[:], al2[:], al3[:], oh1)

    # 3. fine position within the window (DF compare), reference clamp
    le2 = (win_xh[:w] < qh) | ((win_xh[:w] == qh) & (win_xl[:w] <= ql))
    fine = jnp.sum(le2.astype(f32), axis=0, keepdims=True)
    pred = cidx * float(w) + fine - 1.0
    pos = jnp.clip(pred, 0.0, float(n - 2)) - cidx * float(w)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, qh.shape[1]), 0)
    oh_l = (iota_w == pos.astype(jnp.int32)).astype(f32)

    x_lh, x_rh = _select(win_xh, oh_l, w)
    x_ll, x_rl = _select(win_xl, oh_l, w)
    y_lh, y_rh = _select(win_dh, oh_l, w)
    y_ll, y_rl = _select(win_dl, oh_l, w)
    a_h, b_h = _select_ab(win_abh, oh_l, w)
    a_l, b_l = _select_ab(win_abl, oh_l, w)

    q = (qh, ql)
    x_l = (x_lh, x_ll)
    x_r = (x_rh, x_rl)
    y_l = (y_lh, y_ll)
    y_r = (y_rh, y_rl)
    a = (a_h, a_l)
    b = (b_h, b_l)

    # 4. t = (q - x_l) / (x_r - x_l) in double-float
    t = df_div(df_sub(q, x_l), df_sub(x_r, x_l))
    one = (jnp.ones_like(qh), jnp.zeros_like(qh))
    omt = df_sub(one, t)
    # (1-t) y_l + t y_r + t (1-t) (a (1-t) + b t)   [cubic_spline.rs:818-828]
    base = df_add(
        df_add(df_mul(omt, y_l), df_mul(t, y_r)),
        df_mul(df_mul(t, omt), df_add(df_mul(a, omt), df_mul(b, t))),
    )

    # ±inf queries on linear tables (a = b = 0) extrapolate to ±inf like
    # calc_frac (linear.rs:29-37).  The *exact* DF chain turns inf into
    # NaN already at q - x_l (two_sum computes inf - inf in its error
    # term), so the guard uses a naive hi-only t.
    tn = (qh - x_lh) / (x_rh - x_lh)
    lin_inf = (
        jnp.isinf(tn)
        & (a_h == 0.0) & (a_l == 0.0) & (b_h == 0.0) & (b_l == 0.0)
    )
    alt = y_lh + tn * (y_rh - y_lh)
    outh_ref[:] = jnp.where(lin_inf, alt, base[0])
    outl_ref[:] = jnp.where(lin_inf, jnp.zeros_like(alt), base[1])


def fused_eval_1d_df(
    x_hi, x_lo, d_hi, d_lo, a_hi, a_lo, b_hi, b_lo, q_hi, q_lo,
    interpret=False,
):
    """Double-float fused evaluation: all arrays are f32 (hi, lo) pairs.

    ``x``: (n,) knots; ``d``: (n,) data; ``a``/``b``: (n-1,) Hermite
    coefficients (zeros for linear); ``q``: (nq,) flat queries.  Returns
    the (hi, lo) pair of the result — combine with
    :func:`ndarray_interp_tpu.ops.df.df_to_f64` for an f64 view.

    Semantics identical to :func:`pallas_eval.fused_eval_1d` (clamp to
    ``[0, n-2]`` incl. ±inf; NaN queries -> NaN); the interval *selection*
    additionally resolves knots that collide in f32.
    """
    n = x_hi.shape[0]
    nq = q_hi.shape[0]
    w, c, B = _plan(n)
    B = max(512, B // 2)  # hi+lo query-side buffers double the VMEM/lane

    wp = -(-(w + 1) // 16) * 16
    lead_h, kwin_h, dwin_h, ab_h = _pack_windows(
        x_hi, d_hi, a_hi, b_hi, w, c, wp
    )
    lead_l, kwin_l, dwin_l, ab_l = _pack_windows(
        x_lo, d_lo, a_lo, b_lo, w, c, wp, pad=0.0
    )
    splits = []
    for t in (kwin_h, kwin_l, dwin_h, dwin_l, ab_h, ab_l):
        splits.extend(_split3(t))

    nb = (nq + B - 1) // B
    qh = jnp.pad(q_hi, (0, nb * B - nq)).reshape(1, nb * B)
    ql = jnp.pad(q_lo, (0, nb * B - nq)).reshape(1, nb * B)

    kern = functools.partial(_df_kernel, n=n, w=w, c=c, wp=wp)
    fix = lambda i: (0, 0)
    mov = lambda i: (0, i)
    win_spec = [pl.BlockSpec((wp, c), fix, memory_space=pltpu.VMEM)] * 12
    ab_spec = [pl.BlockSpec((2 * w, c), fix, memory_space=pltpu.VMEM)] * 6
    outh, outl = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((c - 1, 1), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((c - 1, 1), fix, memory_space=pltpu.VMEM),
        ]
        + win_spec
        + ab_spec
        + [
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), mov, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, nb * B), jnp.float32),
            jax.ShapeDtypeStruct((1, nb * B), jnp.float32),
        ],
        interpret=interpret,
    )(lead_h, lead_l, *splits, qh, ql)
    return outh.reshape(nb * B)[:nq], outl.reshape(nb * B)[:nq]


def eval_xla_df(x_hi, x_lo, d_hi, d_lo, a_hi, a_lo, b_hi, b_lo, q_hi, q_lo):
    """Plain-XLA double-float formulation (same semantics as the kernel).

    Serves as (a) the correctness oracle on backends where plain jit
    preserves the error-free transforms (CPU — pinned by tests/test_df.py;
    Pallas *interpret* mode does not, see ops/df.py), and (b) the
    non-TPU fallback for the DF evaluation path.
    """
    n = x_hi.shape[0]
    # DF-lexicographic searchsorted(side="right") - 1, clamped — matches
    # the kernel's two-level search and get_lower_index's clamp contract
    # (the shared blocked form caps the (Q, n) mask memory)
    idx = _df_lower_index(x_hi, x_lo, q_hi, q_lo, n)
    pick = lambda v: (v[0][idx], v[1][idx])
    pick1 = lambda v: (v[0][idx + 1], v[1][idx + 1])
    x_l = pick((x_hi, x_lo))
    x_r = pick1((x_hi, x_lo))
    y_l = pick((d_hi, d_lo))
    y_r = pick1((d_hi, d_lo))
    a = pick((a_hi, a_lo))
    b = pick((b_hi, b_lo))
    q = (q_hi, q_lo)

    t = df_div(df_sub(q, x_l), df_sub(x_r, x_l))
    one = (jnp.ones_like(q_hi), jnp.zeros_like(q_hi))
    omt = df_sub(one, t)
    base = df_add(
        df_add(df_mul(omt, y_l), df_mul(t, y_r)),
        df_mul(df_mul(t, omt), df_add(df_mul(a, omt), df_mul(b, t))),
    )
    tn = (q_hi - x_l[0]) / (x_r[0] - x_l[0])  # naive t: inf survives here
    lin_inf = (
        jnp.isinf(tn)
        & (a[0] == 0.0) & (a[1] == 0.0) & (b[0] == 0.0) & (b[1] == 0.0)
    )
    alt = y_l[0] + tn * (y_r[0] - y_l[0])
    return (
        jnp.where(lin_inf, alt, base[0]),
        jnp.where(lin_inf, jnp.zeros_like(alt), base[1]),
    )


def _df_lower_index(x_hi, x_lo, q_hi, q_lo, n, block=None):
    """DF-lexicographic ``get_lower_index`` (compare-all form).

    The count needs the full lexicographic compare (hi, then lo on hi
    ties), which has no ``searchsorted`` method — so it is O(Q·n).  The
    (Q, n) mask is built in query blocks capped at ~64M elements: an
    unblocked 1M-query × 16k-knot serving bucket would materialize a
    16 GB bool mask on CPU backends (XLA fuses it away on TPU, where
    the row-block split is harmless)."""
    nq = q_hi.shape[0]

    def count(qh, ql):
        le = (x_hi[None, :] < qh[:, None]) | (
            (x_hi[None, :] == qh[:, None]) & (x_lo[None, :] <= ql[:, None])
        )
        return jnp.clip(
            jnp.sum(le, axis=1).astype(jnp.int32) - 1, 0, n - 2
        )

    if block is None:
        block = max(1, (1 << 26) // max(int(n), 1))
    if nq <= block:
        return count(q_hi, q_lo)
    npad = -(-nq // block) * block - nq
    qh = jnp.pad(q_hi, (0, npad)).reshape(-1, block)
    ql = jnp.pad(q_lo, (0, npad)).reshape(-1, block)
    idx = jax.lax.map(lambda a: count(a[0], a[1]), (qh, ql))
    return idx.reshape(-1)[:nq]


def _df_calc_frac(x1, y1, x2, y2, q):
    """calc_frac in double-float with the reference slope op order
    (``linear.rs:29-37``): m = (y2-y1)/(x2-x1); m*(q-x1)+y1."""
    m = df_div(df_sub(y2, y1), df_sub(x2, x1))
    return df_add(df_mul(m, df_sub(q, x1)), y1)


def eval_xla_df_2d(
    x_hi, x_lo, y_hi, y_lo, z_hi, z_lo, qx_hi, qx_lo, qy_hi, qy_lo
):
    """Double-float bilinear evaluation (reference semantics
    ``bilinear.rs:64-98``), pure XLA: the corner fetch is gather-bound on
    every backend, so no kernel is needed — only the arithmetic runs in
    (hi, lo) pairs.  ``z`` may carry trailing (bank) dims; returns the
    (hi, lo) result of shape ``(nq, *z.shape[2:])``."""
    nx, ny = x_hi.shape[0], y_hi.shape[0]
    xi = _df_lower_index(x_hi, x_lo, qx_hi, qx_lo, nx)
    yi = _df_lower_index(y_hi, y_lo, qy_hi, qy_lo, ny)
    ex = (Ellipsis,) + (None,) * (z_hi.ndim - 2)  # broadcast over trailing

    def pick(vh, vl, i):
        return (vh[i][ex], vl[i][ex])

    x1 = pick(x_hi, x_lo, xi)
    x2 = pick(x_hi, x_lo, xi + 1)
    y1 = pick(y_hi, y_lo, yi)
    y2 = pick(y_hi, y_lo, yi + 1)
    z11 = (z_hi[xi, yi], z_lo[xi, yi])
    z12 = (z_hi[xi, yi + 1], z_lo[xi, yi + 1])
    z21 = (z_hi[xi + 1, yi], z_lo[xi + 1, yi])
    z22 = (z_hi[xi + 1, yi + 1], z_lo[xi + 1, yi + 1])
    qx = (qx_hi[ex], qx_lo[ex])
    qy = (qy_hi[ex], qy_lo[ex])
    zq1 = _df_calc_frac(x1, z11, x2, z21, qx)
    zq2 = _df_calc_frac(x1, z12, x2, z22, qx)
    return _df_calc_frac(y1, zq1, y2, zq2, qy)


def eval_xla_df_banked(
    x_hi, x_lo, d_hi, d_lo, a_hi, a_lo, b_hi, b_lo, q_hi, q_lo
):
    """Double-float banked Hermite evaluation, pure XLA: data/a/b are
    2-D ``(n, bank)`` / ``(n-1, bank)`` pairs; queries flat.  Two packed
    row gathers (hi + lo) feed the DF polynomial — on every backend the
    gathers dominate, so no kernel variant exists (the gather-engine
    wall, docs/ROADMAP.md).  Returns the (hi, lo) pair ``(nq, bank)``."""
    n = x_hi.shape[0]
    idx = _df_lower_index(x_hi, x_lo, q_hi, q_lo, n)
    x_l = (x_hi[idx], x_lo[idx])
    x_r = (x_hi[idx + 1], x_lo[idx + 1])
    q = (q_hi, q_lo)
    t = df_div(df_sub(q, x_l), df_sub(x_r, x_l))

    def rows(v):
        packed = jnp.concatenate([v[:-1], v[1:]], axis=1)  # y_l | y_r
        return jnp.take(packed, idx, axis=0)

    def rows_ab(va, vb):
        return jnp.take(jnp.concatenate([va, vb], axis=1), idx, axis=0)

    bank = d_hi.shape[1]
    gh, gl = rows(d_hi), rows(d_lo)
    abh, abl = rows_ab(a_hi, b_hi), rows_ab(a_lo, b_lo)
    y_l = (gh[:, :bank], gl[:, :bank])
    y_r = (gh[:, bank:], gl[:, bank:])
    a = (abh[:, :bank], abl[:, :bank])
    b = (abh[:, bank:], abl[:, bank:])

    te = (t[0][:, None], t[1][:, None])
    one = (jnp.ones_like(te[0]), jnp.zeros_like(te[0]))
    omt = df_sub(one, te)
    base = df_add(
        df_add(df_mul(omt, y_l), df_mul(te, y_r)),
        df_mul(df_mul(te, omt), df_add(df_mul(a, omt), df_mul(b, te))),
    )
    tn = (q_hi - x_l[0]) / (x_r[0] - x_l[0])
    lin_inf = (
        jnp.isinf(tn)[:, None]
        & (a[0] == 0.0) & (a[1] == 0.0) & (b[0] == 0.0) & (b[1] == 0.0)
    )
    alt = y_l[0] + tn[:, None] * (y_r[0] - y_l[0])
    return (
        jnp.where(lin_inf, alt, base[0]),
        jnp.where(lin_inf, jnp.zeros_like(alt), base[1]),
    )


def eval_df_from_f64(x64, d64, a64, b64, q64, interpret=False, path="kernel"):
    """Convenience wrapper: split f64 host arrays, run the DF evaluation,
    recombine to f64 on the host.  ``path``: "kernel" (Pallas; pass
    ``interpret=True`` off-TPU) or "xla" (plain-jit formulation)."""
    import jax

    from .df import df_from_f64, df_to_f64

    args = []
    for v in (x64, d64, a64, b64, q64):
        args.extend(df_from_f64(v))
    if path == "xla":
        hi, lo = jax.jit(eval_xla_df)(*args)
    else:
        hi, lo = fused_eval_1d_df(*args, interpret=interpret)
    return df_to_f64(hi, lo)


# -- DF (idx, t) kernel + banked gather route (VERDICT r2 task 3) -------------


def _df_index_kernel(
    leadh_ref, leadl_ref,
    kh1, kh2, kh3, kl1, kl2, kl3,
    qh_ref, ql_ref, idx_ref, th_ref, tl_ref, *, n, w, c, wp,
):
    """DF-lexicographic ``(get_lower_index(q), t)``: the search half of
    ``_df_kernel`` without data/coefficient windows.  Feeds the banked
    gather route, where the row fetch is the gather engine's job."""
    from .df import no_guard

    with no_guard():
        f32 = jnp.float32
        qh = qh_ref[:]
        ql = ql_ref[:]
        leadh = leadh_ref[:]
        leadl = leadl_ref[:]
        le1 = (leadh < qh) | ((leadh == qh) & (leadl <= ql))
        coarse = jnp.sum(le1.astype(f32), axis=0, keepdims=True)
        cmax = float((n - 2) // w)
        cidx = jnp.minimum(coarse, cmax)

        iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, qh.shape[1]), 0)
        oh1 = (iota_c == cidx.astype(jnp.int32)).astype(jnp.bfloat16)
        win_xh = _dot3(kh1[:], kh2[:], kh3[:], oh1)
        win_xl = _dot3(kl1[:], kl2[:], kl3[:], oh1)

        le2 = (win_xh[:w] < qh) | ((win_xh[:w] == qh) & (win_xl[:w] <= ql))
        fine = jnp.sum(le2.astype(f32), axis=0, keepdims=True)
        pred = cidx * float(w) + fine - 1.0
        idx = jnp.clip(pred, 0.0, float(n - 2))
        pos = idx - cidx * float(w)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, qh.shape[1]), 0)
        oh_l = (iota_w == pos.astype(jnp.int32)).astype(f32)

        x_lh, x_rh = _select(win_xh, oh_l, w)
        x_ll, x_rl = _select(win_xl, oh_l, w)
        t = df_div(
            df_sub((qh, ql), (x_lh, x_ll)),
            df_sub((x_rh, x_rl), (x_lh, x_ll)),
        )
        idx_ref[:] = idx.astype(jnp.int32)
        th_ref[:] = t[0]
        tl_ref[:] = t[1]


def fused_index_frac_df(x_hi, x_lo, q_hi, q_lo, interpret=False):
    """DF ``(idx, t_hi, t_lo)`` for flat queries against DF knots.

    Index selection is DF-lexicographic (matches the f64 oracle even for
    knots that collide in f32); ``t`` carries the error-free-transform
    chain (exact on Mosaic; *interpret mode degrades t to f32 grade*, see
    ``ops/df.py`` — only the index is trustworthy there)."""
    n = x_hi.shape[0]
    nq = q_hi.shape[0]
    w, c, B = _plan(n)
    B = max(512, B // 2)

    wp = -(-(w + 1) // 16) * 16
    zd = jnp.zeros_like(x_hi)
    za = jnp.zeros((n - 1,), x_hi.dtype)
    lead_h, kwin_h, _, _ = _pack_windows(x_hi, zd, za, za, w, c, wp)
    lead_l, kwin_l, _, _ = _pack_windows(x_lo, zd, za, za, w, c, wp, pad=0.0)
    splits = []
    for tbl in (kwin_h, kwin_l):
        splits.extend(_split3(tbl))

    nb = (nq + B - 1) // B
    qh = jnp.pad(q_hi, (0, nb * B - nq)).reshape(1, nb * B)
    ql = jnp.pad(q_lo, (0, nb * B - nq)).reshape(1, nb * B)

    kern = functools.partial(_df_index_kernel, n=n, w=w, c=c, wp=wp)
    fix = lambda i: (0, 0)
    mov = lambda i: (0, i)
    idx, th, tl = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((c - 1, 1), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((c - 1, 1), fix, memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec((wp, c), fix, memory_space=pltpu.VMEM)] * 6
        + [
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
    )(lead_h, lead_l, *splits, qh, ql)
    m = nb * B
    return idx.reshape(m)[:nq], th.reshape(m)[:nq], tl.reshape(m)[:nq]


def pack_bank_rows_df(d_hi, d_lo, a_hi, a_lo, b_hi, b_lo):
    """Tightly packed DF per-interval rows ``(n-1, 8*bank_pad)``:
    ``[y_l | y_r | a | b]`` hi halves then lo halves (cf.
    ``pallas_tail.pack_bank_rows`` — the DF rows double the bytes, the
    gather still charges ONE row per query)."""
    bank = d_hi.shape[1]
    bp = -(-bank // 8) * 8
    pad = ((0, 0), (0, bp - bank))

    def p(v):
        return jnp.pad(v, pad)

    return jnp.concatenate(
        [
            p(d_hi[:-1]), p(d_hi[1:]), p(a_hi), p(b_hi),
            p(d_lo[:-1]), p(d_lo[1:]), p(a_lo), p(b_lo),
        ],
        axis=1,
    )


def _df_bank_hermite(y_l, y_r, a, b, t):
    """The DF symmetric-Hermite chain on banked (hi, lo) block pairs —
    shared by the Mosaic tail kernels (under ``no_guard``: Mosaic
    preserves the EFTs) and the guarded-XLA fallback tails.  The
    ``lin_inf`` escape matches the f32 kernel's contract: ±inf queries
    on a linear segment (a=b=0) evaluate the linear form so the result
    is ±inf, not NaN from inf·0."""
    one = (jnp.ones_like(t[0]), jnp.zeros_like(t[0]))
    omt = df_sub(one, t)
    base = df_add(
        df_add(df_mul(omt, y_l), df_mul(t, y_r)),
        df_mul(df_mul(t, omt), df_add(df_mul(a, omt), df_mul(b, t))),
    )
    tn = t[0]
    lin_inf = (
        jnp.isinf(tn)
        & (a[0] == 0.0) & (a[1] == 0.0) & (b[0] == 0.0) & (b[1] == 0.0)
    )
    alt = y_l[0] + tn * (y_r[0] - y_l[0])
    return (
        jnp.where(lin_inf, alt, base[0]),
        jnp.where(lin_inf, jnp.zeros_like(alt), base[1]),
    )


def _df_xla_tail(rows, th, tl, bank):
    """Guarded-EFT XLA DF Hermite on gathered rows — the non-TPU tail.
    NOTE on TPU this formulation is ~12x slower than the Mosaic tail
    kernel: every optimization barrier pins a (Q, bank) intermediate to
    HBM (measured 172 ms vs ~14 ms on 10k x 64 x 1M)."""
    bp = rows.shape[1] // 8

    def sl(i):
        return rows[:, i * bp : i * bp + bank]

    return _df_bank_hermite(
        (sl(0), sl(4)), (sl(1), sl(5)), (sl(2), sl(6)), (sl(3), sl(7)),
        (th[:, None], tl[:, None]),
    )


def gathered_bank_eval_df(
    x_hi, x_lo, d_hi, d_lo, a_hi, a_lo, b_hi, b_lo, q_hi, q_lo,
    interpret=False,
):
    """DF banked gather route: DF (idx, t) kernel → ONE packed (hi, lo)
    row gather → Mosaic DF Hermite tail (:func:`banked_df_tail`; the
    guarded XLA tail is the non-TPU fallback — its barriers pin every
    intermediate to HBM, measured 172 ms vs ~14 ms on chip).  Returns
    (hi, lo) of shape ``(nq, bank)``.  f64-grade wide-bank serving at
    kernel speed (BASELINE.md row "10k-knot x64 bank DF EVAL"; on-chip
    accuracy gate ``test_df_gathered_bank_f64_grade_on_chip``)."""
    # guard the RAW tables too: packing under an ambient jit turns the
    # concrete arrays into tracers before the packed route's check, so
    # a closure-captured bank would slip through (round-5 review)
    check_route_tables(
        "gathered_bank_eval_df",
        [("d_hi", d_hi), ("d_lo", d_lo), ("a_hi", a_hi), ("a_lo", a_lo),
         ("b_hi", b_hi), ("b_lo", b_lo)],
        (q_hi, q_lo),
    )
    packed = pack_bank_rows_df(d_hi, d_lo, a_hi, a_lo, b_hi, b_lo)
    return gathered_bank_eval_df_packed(
        x_hi, x_lo, packed, d_hi.shape[1], q_hi, q_lo, interpret=interpret
    )


def gathered_bank_eval_df_packed(
    x_hi, x_lo, packed, bank, q_hi, q_lo, interpret=False
):
    """The banked DF gather route from a PREPACKED row table (serving
    packs once at evaluator build — re-packing a multi-hundred-MB table
    per call, or closure-capturing it into a jitted lambda, repeats the
    copy and ships it with every remote compile)."""
    check_route_tables(
        "gathered_bank_eval_df_packed", [("packed", packed)], (q_hi, q_lo)
    )
    from .pallas_eval import _plan

    nq = q_hi.shape[0]
    npad = -(-nq // 512) * 512 - nq
    if npad:  # pad BEFORE the gather: padding rows after would copy GBs
        q_hi = jnp.pad(q_hi, (0, npad))
        q_lo = jnp.pad(q_lo, (0, npad))
    if _plan(x_hi.shape[0]) is not None:
        idx, th, tl = jax.lax.platform_dependent(
            q_hi, q_lo,
            tpu=lambda a, b: fused_index_frac_df(
                x_hi, x_lo, a, b, interpret=interpret
            ),
            default=lambda a, b: _df_index_frac_xla(x_hi, x_lo, a, b),
        )
    else:
        idx, th, tl = _df_index_frac_xla(x_hi, x_lo, q_hi, q_lo)
    rows = jnp.take(packed, idx, axis=0)

    def mosaic(rows, th, tl):
        hi, lo = banked_df_tail(rows, th, tl, interpret=interpret)
        return hi[:, :bank], lo[:, :bank]

    hi, lo = jax.lax.platform_dependent(
        rows, th, tl,
        tpu=mosaic,
        default=lambda r, h, l: _df_xla_tail(r, h, l, bank),
    )
    return hi[:nq], lo[:nq]


def _df_tail_kernel(rows_ref, th_ref, tl_ref, outh_ref, outl_ref, *, bp):
    """DF Hermite on gathered (hi, lo) rows, fully inside Mosaic: no
    opacity barriers needed (Mosaic preserves the EFTs), no HBM
    materialization between steps — the fix for the guarded XLA tail,
    whose ~30 barrier-pinned (Q, bank) intermediates each round-trip
    HBM (measured 172 ms/1M queries at 10k x 64; this kernel ~13 ms
    total route)."""
    from .df import no_guard

    with no_guard():
        rows = rows_ref[:]  # (B, 8*bp)
        t = (th_ref[:], tl_ref[:])  # (B, 1) -> broadcasts over lanes

        def sl(i):
            return rows[:, i * bp : (i + 1) * bp]

        outh_ref[:], outl_ref[:] = _df_bank_hermite(
            (sl(0), sl(4)), (sl(1), sl(5)), (sl(2), sl(6)), (sl(3), sl(7)), t
        )


def banked_df_tail(rows, th, tl, interpret=False):
    """Streaming Mosaic DF Hermite tail on gathered packed rows
    ``(Q, 8*bp)`` (Q a multiple of 512).  Returns (hi, lo) of
    ``(Q, bp)``.  NOTE interpret mode rewrites the EFTs — values are
    f32-grade there (ops/df.py); Mosaic is exact."""
    nq, ch = rows.shape
    bp = ch // 8
    # bq=512 is the VMEM ceiling: at 1024 the blocks + the DF tail's
    # live EFT temporaries hit 21.5 MB scoped (measured OOM) — same
    # structural cap as the banked kernel's Br (docs/ROADMAP.md)
    bq = 512
    assert nq % bq == 0, "pad idx/t to a 512 multiple before the gather"
    nb = nq // bq
    outh, outl = pl.pallas_call(
        functools.partial(_df_tail_kernel, bp=bp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        ],
        interpret=interpret,
    )(rows, th.reshape(nq, 1), tl.reshape(nq, 1))
    return outh, outl


# -- f48 banked route (bf16-lo tier for the 1-D wide-bank workload) -----------


def pack_bank_rows_f48(d_hi, d_lo, a_hi, a_lo, b_hi, b_lo):
    """"f48" banked per-interval rows ``(n-1, 6*bp)``: the 4 hi blocks
    ``[y_l | y_r | a | b]`` exactly as in :func:`pack_bank_rows_df`,
    plus the 4 lo blocks ROUNDED TO bf16 and packed two-per-f32-lane —
    ``[y_l_lo | y_r_lo]`` in the high 16 bits of the 2bp packed lanes,
    ``[a_lo | b_lo]`` in the low 16 (``_unpack_f48_lo`` inverts, same
    bit layout as the bicubic tier's :func:`pack_bicubic_rows_f48`).

    75% of the DF table's memory and gather traffic for ~2^-33
    scale-relative accuracy (f32 hi + 8 lo mantissa bits) instead of
    DF's ~2^-48 — the intermediate grade between the f32 banked route
    (~2^-24) and full DF for wide-bank 1-D serving (NS2-series)."""
    bank = d_hi.shape[1]
    bp = -(-bank // 8) * 8
    pad = ((0, 0), (0, bp - bank))

    def p(v):
        return jnp.pad(v, pad)

    hi = jnp.concatenate(
        [p(d_hi[:-1]), p(d_hi[1:]), p(a_hi), p(b_hi)], axis=1
    )
    lo16 = jax.lax.bitcast_convert_type(
        jnp.concatenate(
            [p(d_lo[:-1]), p(d_lo[1:]), p(a_lo), p(b_lo)], axis=1
        ).astype(jnp.bfloat16),
        jnp.uint16,
    ).astype(jnp.uint32)
    half = 2 * bp
    packed_lo = jax.lax.bitcast_convert_type(
        (lo16[:, :half] << 16) | lo16[:, half:], jnp.float32
    )
    return jnp.concatenate([hi, packed_lo], axis=1)


def _f48_bank_tail_kernel(rows_ref, th_ref, tl_ref, outh_ref, outl_ref, *, bp):
    """f48 banked Hermite tail: unpack the bf16-pair lo section in VMEM,
    then the exact `_df_bank_hermite` chain of `_df_tail_kernel`."""
    from .df import no_guard

    with no_guard():
        rows = rows_ref[:]  # (B, 6*bp)
        hi = rows[:, : 4 * bp]
        lo = _unpack_f48_lo(rows[:, 4 * bp :])
        t = (th_ref[:], tl_ref[:])

        def s(v, i):
            return v[:, i * bp : (i + 1) * bp]

        outh_ref[:], outl_ref[:] = _df_bank_hermite(
            (s(hi, 0), s(lo, 0)), (s(hi, 1), s(lo, 1)),
            (s(hi, 2), s(lo, 2)), (s(hi, 3), s(lo, 3)), t
        )


def banked_f48_tail(rows, th, tl, interpret=False):
    """Streaming Mosaic f48 Hermite tail on gathered packed rows
    ``(Q, 6*bp)`` (Q a multiple of 512).  Same contract as
    :func:`banked_df_tail` with the bf16-lo packed table."""
    nq, ch = rows.shape
    bp = ch // 6
    bq = 512  # same VMEM ceiling as banked_df_tail
    assert nq % bq == 0, "pad idx/t to a 512 multiple before the gather"
    nb = nq // bq
    outh, outl = pl.pallas_call(
        functools.partial(_f48_bank_tail_kernel, bp=bp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        ],
        interpret=interpret,
    )(rows, th.reshape(nq, 1), tl.reshape(nq, 1))
    return outh, outl


def gathered_bank_eval_f48_packed(
    x_hi, x_lo, packed, bank, q_hi, q_lo, interpret=False
):
    """The f48-tier banked gather route: identical to
    :func:`gathered_bank_eval_df_packed` (DF (idx, t) kernel → ONE
    packed row gather → Mosaic tail) but from a
    :func:`pack_bank_rows_f48` table — 6bp channels per row instead of
    8bp.  Returns (hi, lo) of shape ``(nq, bank)``; accuracy ~2^-33
    scale-relative, memory and gather traffic 75% of DF."""
    check_route_tables(
        "gathered_bank_eval_f48_packed", [("packed", packed)], (q_hi, q_lo)
    )
    from .pallas_eval import _plan

    nq = q_hi.shape[0]
    npad = -(-nq // 512) * 512 - nq
    if npad:
        q_hi = jnp.pad(q_hi, (0, npad))
        q_lo = jnp.pad(q_lo, (0, npad))
    if _plan(x_hi.shape[0]) is not None:
        idx, th, tl = jax.lax.platform_dependent(
            q_hi, q_lo,
            tpu=lambda a, b: fused_index_frac_df(
                x_hi, x_lo, a, b, interpret=interpret
            ),
            default=lambda a, b: _df_index_frac_xla(x_hi, x_lo, a, b),
        )
    else:
        idx, th, tl = _df_index_frac_xla(x_hi, x_lo, q_hi, q_lo)
    rows = jnp.take(packed, idx, axis=0)
    bp = packed.shape[1] // 6

    def mosaic(rows, th, tl):
        hi, lo = banked_f48_tail(rows, th, tl, interpret=interpret)
        return hi[:, :bank], lo[:, :bank]

    def xla(rw, th, tl):
        full = jnp.concatenate(
            [rw[:, : 4 * bp], _unpack_f48_lo(rw[:, 4 * bp :])], axis=1
        )
        hi, lo = _df_xla_tail(full, th, tl, bank)
        return hi, lo

    hi, lo = jax.lax.platform_dependent(
        rows, th, tl, tpu=mosaic, default=xla
    )
    return hi[:nq], lo[:nq]


# -- DF bilinear gather route (config-3 f64-grade story) ----------------------


def _bilinear_corner_blocks(g, bp):
    """Corner blocks ``(nx-1, ny-1, 4*bp)`` of ``g``: ``[z11|z12|z21|z22]``
    with trailing dims flattened and channel-padded to ``bp``."""
    nx, ny = g.shape[0], g.shape[1]
    r = 1
    for s in g.shape[2:]:
        r *= s
    g = g.reshape(nx, ny, r)
    quad = jnp.stack(
        [g[:-1, :-1], g[:-1, 1:], g[1:, :-1], g[1:, 1:]], axis=2
    )  # (nx-1, ny-1, 4, r)
    if bp != r:
        quad = jnp.pad(quad, ((0, 0),) * 3 + ((0, bp - r),))
    return quad.reshape(nx - 1, ny - 1, 4 * bp)


def pack_bilinear_rows_df(z_hi, z_lo):
    """DF per-cell corner rows ``((nx-1)(ny-1), 8*bp)``: the 4 corner
    blocks hi then lo, trailing dims flattened and padded to bp
    (multiple of 8).  z: (nx, ny, *trailing) pairs."""
    nx, ny = z_hi.shape[0], z_hi.shape[1]
    r = 1
    for s in z_hi.shape[2:]:
        r *= s
    bp = -(-r // 8) * 8
    return jnp.concatenate(
        [_bilinear_corner_blocks(z_hi, bp), _bilinear_corner_blocks(z_lo, bp)],
        axis=-1,
    ).reshape((nx - 1) * (ny - 1), 8 * bp)


def _df_bilinear_core(z11, z12, z21, z22, tx, ty):
    """The DF bilinear chain on corner (hi, lo) pairs — shared by the
    Mosaic tail kernels and the guarded-XLA fallback.  Lerp-with-t
    form: z1 + t*(z2 - z1), equivalent to the reference calc_frac to
    DF rounding."""
    zq1 = df_add(z11, df_mul(tx, df_sub(z21, z11)))
    zq2 = df_add(z12, df_mul(tx, df_sub(z22, z12)))
    return df_add(zq1, df_mul(ty, df_sub(zq2, zq1)))


def _df_bilinear_tail_kernel(
    rows_ref, txh_ref, txl_ref, tyh_ref, tyl_ref, outh_ref, outl_ref, *, bp
):
    """DF bilinear on gathered corner rows, fully inside Mosaic (EFTs
    preserved, no barrier-pinned HBM round trips — see _df_tail_kernel)."""
    from .df import no_guard

    with no_guard():
        rows = rows_ref[:]  # (B, 8*bp)
        tx = (txh_ref[:], txl_ref[:])  # (B, 1)
        ty = (tyh_ref[:], tyl_ref[:])

        def sl(i):
            return rows[:, i * bp : (i + 1) * bp]

        out = _df_bilinear_core(
            (sl(0), sl(4)), (sl(1), sl(5)), (sl(2), sl(6)), (sl(3), sl(7)),
            tx, ty,
        )
        outh_ref[:] = out[0]
        outl_ref[:] = out[1]


def bilinear_df_tail(rows, txh, txl, tyh, tyl, interpret=False):
    """Streaming Mosaic DF bilinear tail; rows (Q, 8*bp), Q a multiple
    of 512.  Returns (hi, lo) of (Q, bp)."""
    nq, ch = rows.shape
    bp = ch // 8
    bq = 512
    assert nq % bq == 0
    nb = nq // bq
    specs_t = [
        pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] * 4
    outh, outl = pl.pallas_call(
        functools.partial(_df_bilinear_tail_kernel, bp=bp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        + specs_t,
        out_specs=[
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        ],
        interpret=interpret,
    )(
        rows,
        txh.reshape(nq, 1), txl.reshape(nq, 1),
        tyh.reshape(nq, 1), tyl.reshape(nq, 1),
    )
    return outh, outl


def _df_bilinear_mxu_core(rows_hi, rows_lo, thT, tlT, bp):
    """Weight-form DF bilinear on pre-split (hi, lo) row halves —
    the bicubic ``_df_bicubic_mxu_core`` recipe at 4 corner blocks.

    Round-5 anatomy (benches/ablate_df2d.py): the lerp-form Mosaic tail
    (``_df_bilinear_tail_kernel``) owned 12.8 ms of NS3c's 27.9 — its
    ~190 guarded-EFT ops run on (B, bp<=16) values, and a VPU op on 16
    lanes issues exactly as many vregs as one on 128 lanes, so the
    chain paid ~8x its useful-lane work (bq=1024 measured no better,
    bq>=2048 OOMs: compute-bound, not per-step overhead).  Here the
    per-query work is 2 narrow DF subs; iota-selects expand the
    [1-t | t] bases to the 4 corner weights (one (B, 4) DF product),
    a one-hot HIGHEST matmul (exact: each output column is a single
    w*1 product) widens to the (B, 4*bp) weight row, then ONE hi-half
    EFT ``two_prod`` and a 2-level compensated halving tree.  Hi products/sums are
    exact; residuals accumulate in f32 at ~2^-48 of term scale — same
    grade as the lerp form (different last-bit rounding; the on-chip
    4e-12 gate `test_df_gathered_bilinear_f64_grade_on_chip` is the
    contract).  Corner blocks are [z11|z12|z21|z22]: block j takes
    x-basis j//2 and y-basis j%2 with basis order [1-t, t]."""
    one = (jnp.ones_like(thT), jnp.zeros_like(thT))
    m = df_sub(one, (thT, tlT))  # DF 1-t for both axes at once, (2, B)

    # Round-5 channel-major build (queries in LANES — see
    # _df_bicubic_mxu_core): stack [1-tx, tx, 1-ty, ty] padded to a
    # K=4 contraction (K=2 one-hot matmuls hang the Mosaic compile),
    # expand to the (4, B) corner-weight factors with exact one-hot
    # HIGHEST matmuls, fold with ONE wide DF mul, transpose to (B, 4).
    # Corner j: x factor j//2, y factor j%2, basis order [1-t, t].
    B = thT.shape[1]
    zero_row = jnp.zeros((1, B), jnp.float32)

    def stack_axis(d, part):
        vals = (m[part][d : d + 1], (thT, tlT)[part][d : d + 1])
        return jnp.concatenate(
            [vals[0], vals[1], zero_row, zero_row], axis=0
        )  # (4, B): [1-t, t, 0, 0]

    def onehot_dot(sel, a):
        return jax.lax.dot(
            sel, a, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
    px = ((jj // 2) == kk).astype(jnp.float32)
    py = ((jj % 2) == kk).astype(jnp.float32)
    ax = tuple(onehot_dot(px, stack_axis(0, p)) for p in (0, 1))
    ay = tuple(onehot_dot(py, stack_axis(1, p)) for p in (0, 1))
    w4 = df_mul(ax, ay)  # one (4, B) DF product for all corners
    w_h = w4[0].T  # (B, 4) — exact MXU transpose
    w_l = w4[1].T

    half = 4 * bp
    lane = jax.lax.broadcasted_iota(jnp.int32, (4, half), 1) // bp
    blk = jax.lax.broadcasted_iota(jnp.int32, (4, half), 0)
    sel = (lane == blk).astype(jnp.float32)
    wrow_h = jax.lax.dot(
        w_h, sel, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    wrow_l = jax.lax.dot(
        w_l, sel, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    p, pe = two_prod(wrow_h, rows_hi)
    e = pe + wrow_l * rows_hi + wrow_h * rows_lo
    while p.shape[1] > bp:
        h = p.shape[1] // 2
        s, se = two_sum(p[:, :h], p[:, h:])
        e = e[:, :h] + e[:, h:] + se
        p = s
    return fast_two_sum(p, e)


def _df_bilinear_mxu_kernel(
    rows_ref, thT_ref, tlT_ref, outh_ref, outl_ref, *, bp
):
    from .df import no_guard

    with no_guard():
        rows = rows_ref[:]
        half = 4 * bp
        out = _df_bilinear_mxu_core(
            rows[:, :half], rows[:, half:],
            thT_ref[:], tlT_ref[:], bp,
        )
        outh_ref[:] = out[0]
        outl_ref[:] = out[1]


def bilinear_df_tail_mxu(rows, txh, txl, tyh, tyl, interpret=False, bq=512):
    """Streaming Mosaic MXU weight-form DF bilinear tail (see
    ``_df_bilinear_mxu_core``); same contract as ``bilinear_df_tail``."""
    nq, ch = rows.shape
    bp = ch // 8
    assert nq % bq == 0
    nb = nq // bq
    outh, outl = pl.pallas_call(
        functools.partial(_df_bilinear_mxu_kernel, bp=bp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        ],
        interpret=interpret,
    )(
        rows,
        jnp.stack([txh.reshape(-1), tyh.reshape(-1)], axis=0),
        jnp.stack([txl.reshape(-1), tyl.reshape(-1)], axis=0),
    )
    return outh, outl


def _df_bilinear_xla_tail(rows, txh, txl, tyh, tyl, r):
    """Guarded-EFT XLA form of the bilinear tail (non-TPU fallback)."""
    bp = rows.shape[1] // 8

    def sl(i):
        return rows[:, i * bp : i * bp + r]

    out = _df_bilinear_core(
        (sl(0), sl(4)), (sl(1), sl(5)), (sl(2), sl(6)), (sl(3), sl(7)),
        (txh[:, None], txl[:, None]), (tyh[:, None], tyl[:, None]),
    )
    return out[0], out[1]


def pack_bilinear_rows_f48(z_hi, z_lo):
    """"f48" bilinear corner rows ``((nx-1)(ny-1), 6*bp)``: the 4 hi
    corner blocks exactly as in :func:`pack_bilinear_rows_df`, plus
    the 4 lo blocks ROUNDED TO bf16 and packed two-per-f32-lane (same
    bit layout as the bank/bicubic tiers; ``_unpack_f48_lo`` inverts).
    75% of the DF table's memory and gather traffic at ~2^-33
    scale-relative accuracy.  Packs directly from the (hi, lo) corners —
    no transient 8bp DF table is materialized (tables can reach
    hundreds of MB; the DF intermediate would be a ~1.33x build-time
    memory peak)."""
    nx, ny = z_hi.shape[0], z_hi.shape[1]
    r = 1
    for s in z_hi.shape[2:]:
        r *= s
    bp = -(-r // 8) * 8
    ncell = (nx - 1) * (ny - 1)
    hi = _bilinear_corner_blocks(z_hi, bp).reshape(ncell, 4 * bp)
    lo16 = jax.lax.bitcast_convert_type(
        _bilinear_corner_blocks(z_lo, bp)
        .reshape(ncell, 4 * bp)
        .astype(jnp.bfloat16),
        jnp.uint16,
    ).astype(jnp.uint32)
    half = 2 * bp
    packed_lo = jax.lax.bitcast_convert_type(
        (lo16[:, :half] << 16) | lo16[:, half:], jnp.float32
    )
    return jnp.concatenate([hi, packed_lo], axis=1)


def _f48_bilinear_tail_kernel(
    rows_ref, thT_ref, tlT_ref, outh_ref, outl_ref, *, bp
):
    """f48 bilinear tail: unpack the bf16-pair lo section in VMEM,
    then the round-5 MXU weight-form core (same chain as the DF tier;
    the bf16 lo half is already ~2^-33-grade, far above the form's
    ~2^-48 accumulation residue)."""
    from .df import no_guard

    with no_guard():
        rows = rows_ref[:]  # (B, 6*bp)
        hi = rows[:, : 4 * bp]
        lo = _unpack_f48_lo(rows[:, 4 * bp :])
        out = _df_bilinear_mxu_core(
            hi, lo, thT_ref[:], tlT_ref[:], bp
        )
        outh_ref[:] = out[0]
        outl_ref[:] = out[1]


def bilinear_f48_tail(rows, txh, txl, tyh, tyl, interpret=False):
    """Streaming Mosaic f48 bilinear tail; rows ``(Q, 6*bp)``, Q a
    multiple of 512.  Same contract as :func:`bilinear_df_tail`."""
    nq, ch = rows.shape
    bp = ch // 6
    bq = 512
    assert nq % bq == 0
    nb = nq // bq
    outh, outl = pl.pallas_call(
        functools.partial(_f48_bilinear_tail_kernel, bp=bp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        ],
        interpret=interpret,
    )(
        rows,
        jnp.stack([txh.reshape(-1), tyh.reshape(-1)], axis=0),
        jnp.stack([txl.reshape(-1), tyl.reshape(-1)], axis=0),
    )
    return outh, outl


def gathered_bilinear_eval_f48_packed(
    x_hi, x_lo, y_hi, y_lo, packed, ny, r, qx_hi, qx_lo, qy_hi, qy_lo,
    interpret=False,
):
    """The f48-tier bilinear gather route from a PREPACKED
    :func:`pack_bilinear_rows_f48` table — 6bp channels per row instead
    of 8bp; otherwise identical to
    :func:`gathered_bilinear_eval_df_packed`."""
    check_route_tables(
        "gathered_bilinear_eval_f48_packed", [("packed", packed)],
        (qx_hi, qx_lo, qy_hi, qy_lo),
    )
    nq = qx_hi.shape[0]
    npad = -(-nq // 512) * 512 - nq
    if npad:
        qx_hi = jnp.pad(qx_hi, (0, npad))
        qx_lo = jnp.pad(qx_lo, (0, npad))
        qy_hi = jnp.pad(qy_hi, (0, npad))
        qy_lo = jnp.pad(qy_lo, (0, npad))
    xi, txh, txl, yi, tyh, tyl = _df_index_frac_2d(
        x_hi, x_lo, y_hi, y_lo, qx_hi, qx_lo, qy_hi, qy_lo,
        interpret=interpret,
    )
    rows = jnp.take(packed, xi * (ny - 1) + yi, axis=0)
    bp = packed.shape[1] // 6

    def mosaic(rows, a1, a2, a3, a4):
        hi, lo = bilinear_f48_tail(rows, a1, a2, a3, a4, interpret=interpret)
        return hi[:, :r], lo[:, :r]

    def xla(rw, a1, a2, a3, a4):
        full = jnp.concatenate(
            [rw[:, : 4 * bp], _unpack_f48_lo(rw[:, 4 * bp :])], axis=1
        )
        return _df_bilinear_xla_tail(full, a1, a2, a3, a4, r)

    hi, lo = jax.lax.platform_dependent(
        rows, txh, txl, tyh, tyl, tpu=mosaic, default=xla
    )
    return hi[:nq], lo[:nq]


def gathered_bilinear_eval_df(
    x_hi, x_lo, y_hi, y_lo, z_hi, z_lo, qx_hi, qx_lo, qy_hi, qy_lo,
    interpret=False,
):
    """DF bilinear gather route: two DF (idx, t) kernels + ONE packed
    (hi, lo) corner-row gather + Mosaic DF tail — the config-3 f64-grade
    path at kernel speed (the 8-separate-corner-fetch XLA form pays
    ~8 gather passes on TPU; the guarded tail would pin intermediates,
    see _df_tail_kernel).  z may carry trailing dims; returns (hi, lo)
    of ``(nq, *z.shape[2:])``."""
    check_route_tables(
        "gathered_bilinear_eval_df", [("z_hi", z_hi), ("z_lo", z_lo)],
        (qx_hi, qx_lo, qy_hi, qy_lo),
    )
    packed = pack_bilinear_rows_df(z_hi, z_lo)
    r = 1
    for s_ in z_hi.shape[2:]:
        r *= s_
    hi, lo = gathered_bilinear_eval_df_packed(
        x_hi, x_lo, y_hi, y_lo, packed, z_hi.shape[1], r,
        qx_hi, qx_lo, qy_hi, qy_lo, interpret=interpret,
    )
    trailing = z_hi.shape[2:]
    nq = qx_hi.shape[0]
    return hi.reshape((nq,) + trailing), lo.reshape((nq,) + trailing)


def gathered_bilinear_eval_df_packed(
    x_hi, x_lo, y_hi, y_lo, packed, ny, r, qx_hi, qx_lo, qy_hi, qy_lo,
    interpret=False,
):
    """The bilinear DF gather route from a PREPACKED corner table (see
    gathered_bank_eval_df_packed).  Returns flat (nq, r) pairs."""
    check_route_tables(
        "gathered_bilinear_eval_df_packed", [("packed", packed)],
        (qx_hi, qx_lo, qy_hi, qy_lo),
    )
    nq = qx_hi.shape[0]
    npad = -(-nq // 512) * 512 - nq
    if npad:
        qx_hi = jnp.pad(qx_hi, (0, npad))
        qx_lo = jnp.pad(qx_lo, (0, npad))
        qy_hi = jnp.pad(qy_hi, (0, npad))
        qy_lo = jnp.pad(qy_lo, (0, npad))
    xi, txh, txl, yi, tyh, tyl = _df_index_frac_2d(
        x_hi, x_lo, y_hi, y_lo, qx_hi, qx_lo, qy_hi, qy_lo,
        interpret=interpret,
    )
    rows = jnp.take(packed, xi * (ny - 1) + yi, axis=0)

    def mosaic(rows, a1, a2, a3, a4):
        hi, lo = bilinear_df_tail_mxu(
            rows, a1, a2, a3, a4, interpret=interpret
        )
        return hi[:, :r], lo[:, :r]

    hi, lo = jax.lax.platform_dependent(
        rows, txh, txl, tyh, tyl,
        tpu=mosaic,
        default=lambda rw, a1, a2, a3, a4: _df_bilinear_xla_tail(
            rw, a1, a2, a3, a4, r
        ),
    )
    return hi[:nq], lo[:nq]


# -- DF bicubic gather route (f64-grade tensor-product cubic) -----------------


def _df_index_frac_2d(
    x_hi, x_lo, y_hi, y_lo, qx_hi, qx_lo, qy_hi, qy_lo, interpret=False
):
    """Both axes' DF ``(idx, t)`` passes: the Pallas DF kernels on TPU
    when both knot counts fit a windowed plan, the XLA DF-lexicographic
    form elsewhere (identical selection, see ``_df_index_frac_xla``)."""
    from .pallas_eval import _plan

    kernel_ok = (
        _plan(x_hi.shape[0]) is not None and _plan(y_hi.shape[0]) is not None
    )
    if kernel_ok:
        def tpu_frac(a, b, c, d):
            xi, txh, txl = fused_index_frac_df(
                x_hi, x_lo, a, b, interpret=interpret
            )
            yi, tyh, tyl = fused_index_frac_df(
                y_hi, y_lo, c, d, interpret=interpret
            )
            return xi, txh, txl, yi, tyh, tyl

        def xla_frac(a, b, c, d):
            xi, txh, txl = _df_index_frac_xla(x_hi, x_lo, a, b)
            yi, tyh, tyl = _df_index_frac_xla(y_hi, y_lo, c, d)
            return xi, txh, txl, yi, tyh, tyl

        return jax.lax.platform_dependent(
            qx_hi, qx_lo, qy_hi, qy_lo, tpu=tpu_frac, default=xla_frac
        )
    xi, txh, txl = _df_index_frac_xla(x_hi, x_lo, qx_hi, qx_lo)
    yi, tyh, tyl = _df_index_frac_xla(y_hi, y_lo, qy_hi, qy_lo)
    return xi, txh, txl, yi, tyh, tyl


def _df_index_frac_xla(x_hi, x_lo, q_hi, q_lo):
    """XLA (idx, t-pair): DF-lexicographic index + DF fraction."""
    n = x_hi.shape[0]
    idx = _df_lower_index(x_hi, x_lo, q_hi, q_lo, n)
    x_l = (x_hi[idx], x_lo[idx])
    x_r = (x_hi[idx + 1], x_lo[idx + 1])
    t = df_div(df_sub((q_hi, q_lo), x_l), df_sub(x_r, x_l))
    return idx, t[0], t[1]


def pack_bicubic_rows_df(rows_hi, rows_lo, r):
    """DF bicubic cell rows ``(cells, 32*bp)``: the 16 pre-scaled corner
    quantity blocks (bicubic cell layout, ``models/strategies/bicubic.
    pack_bicubic_rows``) hi then lo, each r-block padded to bp."""
    cells = rows_hi.shape[0]
    bp = -(-r // 8) * 8

    def blocks(v):
        v3 = v.reshape(cells, 16, r)
        if bp != r:
            v3 = jnp.pad(v3, ((0, 0), (0, 0), (0, bp - r)))
        return v3.reshape(cells, 16 * bp)

    return jnp.concatenate([blocks(rows_hi), blocks(rows_lo)], axis=1)


def _df_hermite_scaled(y_l, y_r, K_l, K_r, t, one):
    """DF Hermite with pre-scaled derivatives (a = K_l - dy)."""
    dy = df_sub(y_r, y_l)
    a = df_sub(K_l, dy)
    b = df_sub(dy, K_r)
    omt = df_sub(one, t)
    return df_add(
        df_add(df_mul(omt, y_l), df_mul(t, y_r)),
        df_mul(df_mul(t, omt), df_add(df_mul(a, omt), df_mul(b, t))),
    )


def _df_bicubic_tail(rows, txh, txl, tyh, tyl, bp):
    """Shared DF bicubic tail body (runs in Mosaic or guarded XLA).
    rows: (B, 32*bp); t: (B, 1) or (B,) pairs."""
    def sl(i):
        return rows[:, i * bp : (i + 1) * bp]

    def q(i):  # quantity i: corners [11, 12, 21, 22] as DF pairs
        return [(sl(4 * i + c), sl(16 + 4 * i + c)) for c in range(4)]

    f = q(0)
    kx = q(1)
    ky = q(2)
    kxy = q(3)
    tx = (txh, txl)
    ty = (tyh, tyl)
    one = (jnp.ones_like(txh), jnp.zeros_like(txh))
    f_y1 = _df_hermite_scaled(f[0], f[2], kx[0], kx[2], tx, one)
    f_y2 = _df_hermite_scaled(f[1], f[3], kx[1], kx[3], tx, one)
    g_y1 = _df_hermite_scaled(ky[0], ky[2], kxy[0], kxy[2], tx, one)
    g_y2 = _df_hermite_scaled(ky[1], ky[3], kxy[1], kxy[3], tx, one)
    return _df_hermite_scaled(f_y1, f_y2, g_y1, g_y2, ty, one)


def _df_bicubic_tail_kernel(
    rows_ref, txh_ref, txl_ref, tyh_ref, tyl_ref, outh_ref, outl_ref, *, bp
):
    from .df import no_guard

    with no_guard():
        out = _df_bicubic_tail(
            rows_ref[:], txh_ref[:], txl_ref[:], tyh_ref[:], tyl_ref[:], bp
        )
        outh_ref[:] = out[0]
        outl_ref[:] = out[1]


def bicubic_df_tail(rows, txh, txl, tyh, tyl, interpret=False):
    """Streaming Mosaic DF bicubic tail; rows (Q, 32*bp), Q a multiple
    of 512.  Returns (hi, lo) of (Q, bp)."""
    nq, ch = rows.shape
    bp = ch // 32
    bq = 512
    assert nq % bq == 0
    nb = nq // bq
    outh, outl = pl.pallas_call(
        functools.partial(_df_bicubic_tail_kernel, bp=bp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        + [
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        * 4,
        out_specs=[
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        ],
        interpret=interpret,
    )(
        rows,
        txh.reshape(nq, 1), txl.reshape(nq, 1),
        tyh.reshape(nq, 1), tyl.reshape(nq, 1),
    )
    return outh, outl


def _df_hermite_basis(t, one):
    """The four scaled-Hermite weights as DF pairs: expanding
    ``_df_hermite_scaled`` over its quantities (y_l, y_r, K_l, K_r)
    gives  w_yl = u + p*d,  w_yr = t - p*d,  w_Kl = p*u,  w_Kr = -p*t
    with u = 1-t, p = t*u, d = u-t (algebraically identical to the
    nested form; DF rounding differs at ~2^-48)."""
    u = df_sub(one, t)
    d = df_sub(u, t)
    p = df_mul(t, u)
    pd = df_mul(p, d)
    return (
        df_add(u, pd),
        df_sub(t, pd),
        df_mul(p, u),
        df_neg(df_mul(p, t)),
    )


def _df_bicubic_weights(tx, ty, one):
    """The 16 tensor-product weights, one DF pair per cell-row block
    ``b = 4*i + c`` (quantity i in [f, kx, ky, kxy], corner c in
    [11, 12, 21, 22]): W[b] = Ax[i][cx] * Ay[i][cy] with cx = c>>1,
    cy = c&1; Ax = (value, value, deriv, deriv)[i] x-basis, Ay the
    y-basis — the closed form of the 5-Hermite nesting in
    ``_df_bicubic_tail``."""
    bx = _df_hermite_basis(tx, one)
    by = _df_hermite_basis(ty, one)
    w16 = []
    for i in range(4):
        ax = (bx[0], bx[1]) if i in (0, 2) else (bx[2], bx[3])
        ay = (by[0], by[1]) if i in (0, 1) else (by[2], by[3])
        for c in range(4):
            w16.append(df_mul(ax[c >> 1], ay[c & 1]))
    return w16


def _df_bicubic_weight_tail_mxu(rows, thT, tlT, bp):
    """Full-lane weight-form DF bicubic tail: MXU one-hot weight-row
    build + ONE EFT product across the whole (B, 32*bp) row +
    compensated halving tree.

    The round-3 lane-packed full-row form measured 52.3 ms/1M on NS3d
    (vs 67.2 nested) but built its (B, 32*bp) weight row by
    concatenating 16 sub-128-lane ``broadcast_to`` pieces — a Mosaic
    relayout — and its temporaries OOM'd scoped VMEM at bq=512.  Here
    every widening step is a 0/1 one-hot matmul, EXACT at
    ``Precision.HIGHEST`` (each output column has exactly one 1, so it
    is a single w*1 product) — the MXU does the relayouts the concats
    paid for: (B, 1) Hermite bases → (B, 4) → (B, 16) block weights
    (one (B, 16) DF product for all 16) → the (B, 16*bp) hi-half
    weight row.  The EFT ``two_prod`` runs on the HI half of the
    gathered row only (the lo twins are 2^-24-scale, so plain-f32
    ``w_hi*row_lo`` already lands at ~2^-48 of term scale), followed
    by a compensated halving tree of ``two_sum`` (lane-aligned slices
    down to 128; sub-lane only at the last level).  Hi products and
    hi sums are exact; residuals accumulate in f32 at ~2^-48 of term
    scale (same grade as the nested tail, different last-bit
    rounding).  Mosaic-only (the guarded-XLA CPU twin stays
    ``df_records._df_bicubic_weight_tail``).  Round 5: the t pairs
    arrive stacked/transposed as (2, B) — see the core."""
    half = 16 * bp
    return _df_bicubic_mxu_core(
        rows[:, :half], rows[:, half:], thT, tlT, bp
    )


def _df_bicubic_mxu_core(rows_hi, rows_lo, thT, tlT, bp):
    """Body of ``_df_bicubic_weight_tail_mxu`` over pre-split (hi, lo)
    row halves — shared with the f48 tier, whose lo half arrives
    bf16-packed and is unpacked before this core.

    Round 5: the weight build runs CHANNEL-MAJOR with queries in LANES
    (``thT``/``tlT`` arrive as (2, B): rows = x, y axis fractions) —
    the ~170-guarded-op basis chain issues B/128 vregs per op instead
    of B/8 (issue count scales with sublanes, not lanes), the
    (16, 4)-one-hot expansions select from (4, B) basis stacks, ONE
    wide DF mul folds them, and one exact MXU transpose per part
    yields the (B, 16) weight matrix — the ``_df_nd_weight_row_cm``
    recipe at k=2 with the bicubic's own block mapping.  (The first
    shipped form computed all 16 block weights as separate (B, 1) DF
    chains; the round-5 row-major batched form ran the basis chain at
    B/8 issues — each superseded in turn, measured in BASELINE.md.)"""
    one = (jnp.ones_like(thT), jnp.zeros_like(thT))
    basis = _df_hermite_basis((thT, tlT), one)  # 4 pairs, each (2, B)

    def stack_axis(d, part):
        return jnp.concatenate(
            [basis[g][part][d : d + 1] for g in range(4)], axis=0
        )  # (4, B)

    # HIGHEST everywhere: the default f32 matmul is ONE bf16 MXU pass
    # (measured 2.1e-3 rel err on chip); bf16x3 decomposes each f32
    # operand into three non-overlapping parts, and against a 0/1
    # matrix every part-product and the f32 accumulation are exact
    def onehot_dot(sel, a):
        return jax.lax.dot(
            sel, a, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    # expand the 4-weight bases to the 16 blocks j = 4i + c
    # (quantity i, corner c): x-basis index = (c>>1) + 2*(i in {1,3}),
    # y-basis index = (c&1) + 2*(i in {2,3}) — 0/1 matrices, exact,
    # built from iota (Pallas kernels cannot capture constant arrays)
    jj = jax.lax.broadcasted_iota(jnp.int32, (16, 4), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (16, 4), 1)
    qi = jj // 4
    cc = jj % 4
    px = ((cc // 2 + 2 * (qi % 2)) == kk).astype(jnp.float32)
    py = ((cc % 2 + 2 * (qi // 2)) == kk).astype(jnp.float32)
    ax = tuple(onehot_dot(px, stack_axis(0, k)) for k in (0, 1))  # (16, B)
    ay = tuple(onehot_dot(py, stack_axis(1, k)) for k in (0, 1))
    w16 = df_mul(ax, ay)  # one (16, B) DF product for all blocks
    w_h = w16[0].T  # (B, 16) — exact MXU transpose
    w_l = w16[1].T

    half = 16 * bp
    lane = jax.lax.broadcasted_iota(jnp.int32, (16, half), 1) // bp
    blk = jax.lax.broadcasted_iota(jnp.int32, (16, half), 0)
    sel = (lane == blk).astype(jnp.float32)
    wrow_h = jax.lax.dot(
        w_h, sel, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    wrow_l = jax.lax.dot(
        w_l, sel, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    # EFT product on the HI half only: the lo twins are 2^-24-scale,
    # so w_hi*row_lo in plain f32 already lands at ~2^-48 of term
    # scale and w_lo*row_lo is negligible — same grade as running
    # two_prod across the full row, at half the EFT width
    p, pe = two_prod(wrow_h, rows_hi)
    e = pe + wrow_l * rows_hi + wrow_h * rows_lo
    # compensated halving tree: lane j of the half sums block (j//bp)
    # with block (j//bp + nblocks/2); two_sum keeps every hi sum exact
    while p.shape[1] > bp:
        h = p.shape[1] // 2
        s, se = two_sum(p[:, :h], p[:, h:])
        e = e[:, :h] + e[:, h:] + se
        p = s
    return fast_two_sum(p, e)


def _df_bicubic_mxu_kernel(
    rows_ref, thT_ref, tlT_ref, outh_ref, outl_ref, *, bp
):
    from .df import no_guard

    with no_guard():
        out = _df_bicubic_weight_tail_mxu(
            rows_ref[:], thT_ref[:], tlT_ref[:], bp
        )
        outh_ref[:] = out[0]
        outl_ref[:] = out[1]


def bicubic_df_tail_mxu(rows, txh, txl, tyh, tyl, interpret=False, bq=512):
    """Streaming Mosaic MXU weight-form DF bicubic tail (see
    ``_df_bicubic_weight_tail_mxu``); same contract as
    ``bicubic_df_tail``.  bq=512 fits scoped VMEM with the half-width
    EFT (the full-width form OOM'd there and ran at 256)."""
    nq, ch = rows.shape
    bp = ch // 32
    assert nq % bq == 0
    nb = nq // bq
    outh, outl = pl.pallas_call(
        functools.partial(_df_bicubic_mxu_kernel, bp=bp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        ],
        interpret=interpret,
    )(
        rows,
        jnp.stack([txh.reshape(-1), tyh.reshape(-1)], axis=0),
        jnp.stack([txl.reshape(-1), tyl.reshape(-1)], axis=0),
    )
    return outh, outl


def pack_bicubic_rows_f48(rows_hi, rows_lo, r):
    """"f48" bicubic cell rows ``(cells, 24*bp)``: the 16 pre-scaled hi
    blocks exactly as in ``pack_bicubic_rows_df``, plus the 16 lo blocks
    ROUNDED TO bf16 and packed two-per-f32-lane — packed lane ``l`` of
    the 8-block lo section holds ``bf16(lo block l//bp)`` in its high 16
    bits and ``bf16(lo block l//bp + 8)`` in the low 16 (bf16 → f32 is
    exactly appending 16 zero bits, so unpacking is two integer masks).

    1.5 KB rows at r=16 vs the DF table's 2 KB — 75% of the memory and
    gather traffic for ~2^-33 relative accuracy (f32 hi + 8 lo mantissa
    bits) instead of DF's ~2^-48: the intermediate grade between the
    f32 cell route (~2^-24) and full DF, for workloads that need better
    than single precision but not the full double-float cost
    (docs/ROADMAP.md, "DF bicubic cost")."""
    cells = rows_hi.shape[0]
    bp = -(-r // 8) * 8

    def blocks(v):
        v3 = v.reshape(cells, 16, r)
        if bp != r:
            v3 = jnp.pad(v3, ((0, 0), (0, 0), (0, bp - r)))
        return v3.reshape(cells, 16 * bp)

    hi = blocks(rows_hi)
    lo16 = jax.lax.bitcast_convert_type(
        blocks(rows_lo).astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    half = 8 * bp
    packed_lo = jax.lax.bitcast_convert_type(
        (lo16[:, :half] << 16) | lo16[:, half:], jnp.float32
    )
    return jnp.concatenate([hi, packed_lo], axis=1)


def _unpack_f48_lo(packed_lo):
    """Unpack a bf16-pair lo section back to twice as many f32 lanes:
    high 16 bits → the first half of the output blocks, low 16 bits
    (shifted up) → the second half.  Shared by the bank / bilinear /
    bicubic / ND f48 tiers — each half is half the packed section's
    lanes (2bp for bank/bilinear, 8bp for bicubic at r=16, where it is
    also 128-aligned), so the concat is a block join in Mosaic."""
    u = jax.lax.bitcast_convert_type(packed_lo, jnp.uint32)
    first = jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32
    )
    second = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return jnp.concatenate([first, second], axis=1)


def _f48_bicubic_mxu_kernel(
    rows_ref, thT_ref, tlT_ref, outh_ref, outl_ref, *, bp
):
    from .df import no_guard

    with no_guard():
        rows = rows_ref[:]
        half = 16 * bp
        out = _df_bicubic_mxu_core(
            rows[:, :half],
            _unpack_f48_lo(rows[:, half:]),
            thT_ref[:], tlT_ref[:], bp,
        )
        outh_ref[:] = out[0]
        outl_ref[:] = out[1]


def bicubic_f48_tail(rows, txh, txl, tyh, tyl, interpret=False, bq=512):
    """Streaming Mosaic MXU tail for the f48 tier: unpack the bf16 lo
    pairs in VMEM, then the exact ``_df_bicubic_weight_tail_mxu`` chain.
    Same contract as ``bicubic_df_tail`` with 24bp-channel rows."""
    nq, ch = rows.shape
    bp = ch // 24
    assert nq % bq == 0
    nb = nq // bq
    outh, outl = pl.pallas_call(
        functools.partial(_f48_bicubic_mxu_kernel, bp=bp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
            jax.ShapeDtypeStruct((nq, bp), jnp.float32),
        ],
        interpret=interpret,
    )(
        rows,
        jnp.stack([txh.reshape(-1), tyh.reshape(-1)], axis=0),
        jnp.stack([txl.reshape(-1), tyl.reshape(-1)], axis=0),
    )
    return outh, outl


def gathered_bicubic_eval_f48_packed(
    x_hi, x_lo, y_hi, y_lo, packed, qx_hi, qx_lo, qy_hi, qy_lo,
    r=1, interpret=False,
):
    """The f48-tier bicubic cell route: identical to
    ``gathered_bicubic_eval_df_packed`` (DF (idx, t) passes + ONE row
    gather + Mosaic MXU tail) but from a ``pack_bicubic_rows_f48`` table
    — 24bp channels per row instead of 32bp.  Returns an (hi, lo) pair
    like the DF route; accuracy ~2^-33 scale-relative (the lo half is
    bf16-rounded), memory and gather traffic 75% of DF."""
    check_route_tables(
        "gathered_bicubic_eval_f48_packed", [("packed", packed)],
        (qx_hi, qx_lo, qy_hi, qy_lo),
    )
    ny1 = y_hi.shape[0] - 1
    nq = qx_hi.shape[0]
    npad = -(-nq // 512) * 512 - nq
    if npad:
        qx_hi = jnp.pad(qx_hi, (0, npad))
        qx_lo = jnp.pad(qx_lo, (0, npad))
        qy_hi = jnp.pad(qy_hi, (0, npad))
        qy_lo = jnp.pad(qy_lo, (0, npad))

    xi, txh, txl, yi, tyh, tyl = _df_index_frac_2d(
        x_hi, x_lo, y_hi, y_lo, qx_hi, qx_lo, qy_hi, qy_lo,
        interpret=interpret,
    )

    rows = jnp.take(packed, xi * ny1 + yi, axis=0)
    bp = packed.shape[1] // 24

    def mosaic(rows, a1, a2, a3, a4):
        hi, lo = bicubic_f48_tail(rows, a1, a2, a3, a4, interpret=interpret)
        return hi[:, :r], lo[:, :r]

    def xla(rw, a1, a2, a3, a4):
        half = 16 * bp
        full = jnp.concatenate(
            [rw[:, :half], _unpack_f48_lo(rw[:, half:])], axis=1
        )
        hi, lo = _df_bicubic_tail(
            full, a1[:, None], a2[:, None], a3[:, None], a4[:, None], bp
        )
        return hi[:, :r], lo[:, :r]

    hi, lo = jax.lax.platform_dependent(
        rows, txh, txl, tyh, tyl, tpu=mosaic, default=xla
    )
    return hi[:nq], lo[:nq]


def gathered_bicubic_eval_df(
    x_hi, x_lo, y_hi, y_lo, rows_hi, rows_lo, qx_hi, qx_lo, qy_hi, qy_lo,
    r=1, interpret=False,
):
    """DF bicubic gather route: two DF (idx, t) kernels + ONE packed
    (hi, lo) cell-row gather + Mosaic DF tail (guarded-XLA fallback).

    ``rows``: the PRE-SCALED 16r-channel cell table (hi, lo) — pack the
    f64 ``BicubicStrategy.rows`` with ``df_from_f64`` and feed both
    halves here (``pack_bicubic_rows_df`` pads blocks internally).
    f64-grade tensor-product cubic on f32 hardware; the beyond-reference
    flagship 2-D strategy's "matching f64 accuracy" story."""
    check_route_tables(
        "gathered_bicubic_eval_df",
        [("rows_hi", rows_hi), ("rows_lo", rows_lo)],
        (qx_hi, qx_lo, qy_hi, qy_lo),
    )
    packed = pack_bicubic_rows_df(rows_hi, rows_lo, r)
    return gathered_bicubic_eval_df_packed(
        x_hi, x_lo, y_hi, y_lo, packed, qx_hi, qx_lo, qy_hi, qy_lo,
        r=r, interpret=interpret,
    )


def gathered_bicubic_eval_df_packed(
    x_hi, x_lo, y_hi, y_lo, packed, qx_hi, qx_lo, qy_hi, qy_lo,
    r=1, interpret=False, tail="mxu",
):
    """The bicubic DF gather route from a PREPACKED ``(cells, 32*bp)``
    table (see gathered_bank_eval_df_packed).

    ``tail`` (NS3d 1M-query measurements, round 3): "mxu" (default —
    the full-lane MXU weight-form kernel: 47.8 ms with the one-hot
    basis expansion + hi-half EFT at bq=512; its first form measured
    55.8 at bq=256), "nested" (the 5-Hermite nesting, 67.2 ms — the
    pre-round-3 ship), or "weight" (the per-block sequential form,
    94.7 ms — kept with tests as the record of why full-lane
    arithmetic matters)."""
    check_route_tables(
        "gathered_bicubic_eval_df_packed", [("packed", packed)],
        (qx_hi, qx_lo, qy_hi, qy_lo),
    )
    ny1 = y_hi.shape[0] - 1
    nq = qx_hi.shape[0]
    npad = -(-nq // 512) * 512 - nq
    if npad:
        qx_hi = jnp.pad(qx_hi, (0, npad))
        qx_lo = jnp.pad(qx_lo, (0, npad))
        qy_hi = jnp.pad(qy_hi, (0, npad))
        qy_lo = jnp.pad(qy_lo, (0, npad))

    xi, txh, txl, yi, tyh, tyl = _df_index_frac_2d(
        x_hi, x_lo, y_hi, y_lo, qx_hi, qx_lo, qy_hi, qy_lo,
        interpret=interpret,
    )

    rows = jnp.take(packed, xi * ny1 + yi, axis=0)
    bp = packed.shape[1] // 32
    if tail == "weight":  # measured-negative record (ops/df_records.py)
        from .df_records import bicubic_df_tail_w as tail_fn
    else:
        tail_fn = {"mxu": bicubic_df_tail_mxu, "nested": bicubic_df_tail}[tail]

    def mosaic(rows, a1, a2, a3, a4):
        hi, lo = tail_fn(rows, a1, a2, a3, a4, interpret=interpret)
        return hi[:, :r], lo[:, :r]

    def xla(rw, a1, a2, a3, a4):
        hi, lo = _df_bicubic_tail(
            rw, a1[:, None], a2[:, None], a3[:, None], a4[:, None], bp
        )
        return hi[:, :r], lo[:, :r]

    hi, lo = jax.lax.platform_dependent(
        rows, txh, txl, tyh, tyl, tpu=mosaic, default=xla
    )
    return hi[:nq], lo[:nq]


# -- DF bicubic NODE route (memory-frugal f64-grade) ---------------------------


def pack_bicubic_nodes_df(nodes_hi, nodes_lo):
    """DF node table ``(nx*ny, 8r+4)``: the (hi, lo) split of the
    memory-frugal bicubic node rows (``models/strategies/bicubic.
    pack_bicubic_nodes`` — raw unscaled ``[f | kx | ky | kxy]`` plus the
    node's own DF ``(x, y)``), BLOCK-INTERLEAVED —
    ``[f_hi|f_lo|kx_hi|kx_lo|ky_hi|ky_lo|kxy_hi|kxy_lo|x_hi,x_lo,y_hi,
    y_lo]`` — so every slice the Mosaic tail kernel takes sits at a
    multiple of ``r`` (at r=16 the coords land exactly on the 128-lane
    tile boundary), at the same memory as a plain hi‖lo concat.  2x the
    f32 node table ≈ the grid's f64 memory — the f64-grade route for
    grids whose cell table (17x data, 2x again for DF) would not fit."""
    c = nodes_hi.shape[1]
    r = (c - 2) // 4
    parts = []
    for i in range(4):
        parts.append(nodes_hi[:, i * r : (i + 1) * r])
        parts.append(nodes_lo[:, i * r : (i + 1) * r])
    for j in (0, 1):
        parts.append(nodes_hi[:, 4 * r + j : 4 * r + j + 1])
        parts.append(nodes_lo[:, 4 * r + j : 4 * r + j + 1])
    return jnp.concatenate(parts, axis=1)


def _df_hermite_dx(y_l, y_r, k_l, k_r, dx, t, one):
    """DF Hermite with UNSCALED derivatives and an explicit DF interval
    width — the node-layout arithmetic
    (``models/strategies/bicubic._hermite``): scale the derivatives,
    then the shared pre-scaled EFT chain (``_df_hermite_scaled``)."""
    return _df_hermite_scaled(
        y_l, y_r, df_mul(k_l, dx), df_mul(k_r, dx), t, one
    )


def _df_node_tail(g11, g12, g21, g22, txh, txl, tyh, tyl, r):
    """Shared DF node-route tail body (guarded XLA or Mosaic): unpack
    the four block-interleaved node rows (``pack_bicubic_nodes_df``
    layout), DF interval widths from the gathered corner coordinates,
    derivative scaling in-tail, then the 5-Hermite nesting.  t args are
    (B, 1) hi/lo columns."""

    def unpack(g):
        def blk(i):
            return (
                g[:, 2 * i * r : (2 * i + 1) * r],
                g[:, (2 * i + 1) * r : (2 * i + 2) * r],
            )

        base = 8 * r

        def coord(j):
            s = base + 2 * j
            return (g[:, s : s + 1], g[:, s + 1 : s + 2])

        return blk(0), blk(1), blk(2), blk(3), coord(0), coord(1)

    f11, kx11, ky11, kxy11, x1, y1 = unpack(g11)
    f12, kx12, ky12, kxy12, _, y2 = unpack(g12)
    f21, kx21, ky21, kxy21, x2, _ = unpack(g21)
    f22, kx22, ky22, kxy22, _, _ = unpack(g22)
    dx = df_sub(x2, x1)
    dy = df_sub(y2, y1)
    tx = (txh, txl)
    ty = (tyh, tyl)
    one = (jnp.ones_like(txh), jnp.zeros_like(txh))
    f_y1 = _df_hermite_dx(f11, f21, kx11, kx21, dx, tx, one)
    f_y2 = _df_hermite_dx(f12, f22, kx12, kx22, dx, tx, one)
    g_y1 = _df_hermite_dx(ky11, ky21, kxy11, kxy21, dx, tx, one)
    g_y2 = _df_hermite_dx(ky12, ky22, kxy12, kxy22, dx, tx, one)
    return _df_hermite_dx(f_y1, f_y2, g_y1, g_y2, dy, ty, one)


def _df_node_tail_kernel(
    g11_ref, g12_ref, g21_ref, g22_ref,
    txh_ref, txl_ref, tyh_ref, tyl_ref,
    outh_ref, outl_ref, *, r,
):
    from .df import no_guard

    with no_guard():
        hi, lo = _df_node_tail(
            g11_ref[:], g12_ref[:], g21_ref[:], g22_ref[:],
            txh_ref[:], txl_ref[:], tyh_ref[:], tyl_ref[:], r,
        )
        outh_ref[:] = hi
        outl_ref[:] = lo


def bicubic_df_node_tail(
    g11, g12, g21, g22, txh, txl, tyh, tyl, r, interpret=False, bq=256
):
    """Streaming Mosaic DF node-route tail: the four gathered node-row
    arrays stream through VMEM once and the whole DF chain — interval
    widths, derivative scaling, 5 Hermites — runs un-guarded on the VPU
    (Mosaic preserves the EFTs; pinned on chip by
    ``test_df_bicubic_node_route_f64_grade_on_chip``).

    This replaces the guarded-XLA tail ON TPU, where the barriers pin
    every EFT intermediate to HBM: the XLA node tail measured
    **1,625 ms/1M queries** on the NS3d workload (512x512x16; 4.8 ms
    index + 19 ms gathers of the 1650.7 total, chunk=65536; 1957 ms at
    chunk=262144) — ~27 ms per pinned DF op round-trip.  The kernel
    streams the same gathered bytes once."""
    nq, ch = g11.shape
    assert nq % bq == 0
    nb = nq // bq
    row_spec = pl.BlockSpec((bq, ch), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bq, r), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outh, outl = pl.pallas_call(
        functools.partial(_df_node_tail_kernel, r=r),
        grid=(nb,),
        in_specs=[row_spec] * 4 + [t_spec] * 4,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nq, r), jnp.float32),
            jax.ShapeDtypeStruct((nq, r), jnp.float32),
        ],
        interpret=interpret,
    )(
        g11, g12, g21, g22,
        txh.reshape(nq, 1), txl.reshape(nq, 1),
        tyh.reshape(nq, 1), tyl.reshape(nq, 1),
    )
    return outh, outl


def gathered_bicubic_nodes_eval_df(
    x_hi, x_lo, y_hi, y_lo, packed, qx_hi, qx_lo, qy_hi, qy_lo,
    r=1, interpret=False, chunk=65536, fetch="quad", bq=256,
):
    """DF bicubic from the memory-frugal NODE table: two DF (idx, t)
    passes + FOUR (hi, lo) node-row gathers + the DF tail that scales
    derivatives by the DF interval widths read from the gathered corner
    coordinates — on TPU a streaming Mosaic kernel
    (``bicubic_df_node_tail``), elsewhere the guarded-XLA chain.

    The f64-grade route for grids past ``config.bicubic_pack_max_elems``
    (the DF *cell* table is 2x the f32 one, so exactly the large grids
    that need DF most are the ones the cell route cannot hold).  Slower
    than the cell route by design: 4 row gathers instead of 1 (the
    gather engine charges per row — docs/ROADMAP.md); memory is the
    axis this route wins on.  On TPU the tail streams the gathered rows
    through VMEM once; the guarded-XLA tail's barriers pin every EFT
    intermediate to HBM there (measured 1,625 ms/1M tail-only on NS3d —
    see ``bicubic_df_node_tail``), so it remains the CPU/oracle path
    only, run in ``chunk``-query pieces under ``lax.map``: the barriers
    keep every EFT intermediate live at once, and the unchunked tail
    measured **59 GB** of HLO temp on the 1M-query 512x512x16 workload
    (v5e OOM) — chunking caps the live set at ~chunk x channels x EFT
    depth.  ``fetch="pair"`` (XLA branch only) fetches the two
    y-adjacent nodes of each x-row with ONE (2, w)-sliced gather —
    2 gathers/query instead of 4, identical values; MEASURED NEGATIVE
    on chip: 5,242.8 ms vs 1,650.7 quad on NS3d — the vmapped
    dynamic-slice lowers to a far costlier access pattern than two flat
    row gathers, so it stays a tested record, not a route.
    Semantics anchor: the 2-D eval contract of
    ``interp2d/mod.rs:175-196``; accuracy matches the cell route
    (``tests/test_df.py::TestDFBicubicNodeRoute``)."""
    check_route_tables(
        "gathered_bicubic_nodes_eval_df", [("packed", packed)],
        (qx_hi, qx_lo, qy_hi, qy_lo),
    )
    ny = y_hi.shape[0]
    nq = qx_hi.shape[0]
    npad = -(-nq // bq) * bq - nq
    if npad:
        qx_hi = jnp.pad(qx_hi, (0, npad))
        qx_lo = jnp.pad(qx_lo, (0, npad))
        qy_hi = jnp.pad(qy_hi, (0, npad))
        qy_lo = jnp.pad(qy_lo, (0, npad))
    xi, txh, txl, yi, tyh, tyl = _df_index_frac_2d(
        x_hi, x_lo, y_hi, y_lo, qx_hi, qx_lo, qy_hi, qy_lo,
        interpret=interpret,
    )

    def mosaic(xi, txh, txl, yi, tyh, tyl):
        base = xi * ny + yi
        g11 = jnp.take(packed, base, axis=0)
        g12 = jnp.take(packed, base + 1, axis=0)
        g21 = jnp.take(packed, base + ny, axis=0)
        g22 = jnp.take(packed, base + ny + 1, axis=0)
        return bicubic_df_node_tail(
            g11, g12, g21, g22, txh, txl, tyh, tyl,
            r=r, interpret=interpret, bq=bq,
        )

    def tail_chunk(args):
        xi, txh, txl, yi, tyh, tyl = args
        if fetch == "pair":
            w = packed.shape[1]

            def pair(start):
                g2 = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(
                        packed, (s, jnp.zeros((), s.dtype)), (2, w)
                    )
                )(start)
                return g2[:, 0, :], g2[:, 1, :]

            g11, g12 = pair(xi * ny + yi)
            g21, g22 = pair((xi + 1) * ny + yi)
        else:
            base = xi * ny + yi
            g11 = jnp.take(packed, base, axis=0)
            g12 = jnp.take(packed, base + 1, axis=0)
            g21 = jnp.take(packed, base + ny, axis=0)
            g22 = jnp.take(packed, base + ny + 1, axis=0)
        return _df_node_tail(
            g11, g12, g21, g22,
            txh[:, None], txl[:, None], tyh[:, None], tyl[:, None], r,
        )

    def xla(xi, txh, txl, yi, tyh, tyl):
        nqp = xi.shape[0]
        if nqp <= chunk:
            return tail_chunk((xi, txh, txl, yi, tyh, tyl))
        cpad = -(-nqp // chunk) * chunk - nqp
        parts = tuple(
            jnp.pad(v, (0, cpad)).reshape(-1, chunk)
            for v in (xi, txh, txl, yi, tyh, tyl)
        )
        hi, lo = jax.lax.map(tail_chunk, parts)
        # chunk padding can exceed the bq padding the mosaic branch
        # uses — slice back so both platform branches agree on shape
        return hi.reshape(-1, r)[:nqp], lo.reshape(-1, r)[:nqp]

    if fetch == "pair":  # measured-negative record: always the XLA form
        hi, lo = xla(xi, txh, txl, yi, tyh, tyl)
    else:
        hi, lo = jax.lax.platform_dependent(
            xi, txh, txl, yi, tyh, tyl, tpu=mosaic, default=xla
        )
    return hi[:nq], lo[:nq]
