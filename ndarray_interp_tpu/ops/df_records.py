"""Measured-NEGATIVE double-float kernel variants, kept as the record.

Nothing in this module is on a shipped route.  Each function here was
built, measured on the NS3d workload (1M queries, 512x512x16 bicubic
grid, v5e), lost to the shipped form, and is retained — with its tests
(``tests/test_df.py``) — so the measurement cannot be un-learned and the
next perf pass does not rebuild it.  The shipped DF routes live in
``ops/pallas_eval_df.py`` (see its module-docstring route map); the
numbers below are summarized in ``docs/ROADMAP.md`` (Performance).

Records held here:

- ``bicubic_df_tail_w`` / ``_df_bicubic_weight_tail`` — the per-block
  sequential weight-form DF bicubic tail: **94.7 ms/1M** at bq=256 vs
  67.2 ms for the nested form and 47.8 ms for the shipped MXU form
  (``pallas_eval_df.bicubic_df_tail_mxu``).  Why it loses: the 32
  sub-lane (B, bp) row slices live lane-padded in VMEM (8x waste) and
  the serial compensated chain stalls the VPU.  An intermediate
  lane-packed full-row form (one ``two_prod`` across the whole
  (B, 32*bp) row) measured 52.3 ms but OOM'd the 16 MB scoped-VMEM
  limit at any amortizing block size (19.3-28.1 MB across three
  variants) — the MXU one-hot weight-row build fixed both problems.

Records retained elsewhere (where the shipped twin lives next door):

- ``pallas_eval_df.gathered_bicubic_nodes_eval_df(fetch="pair")`` —
  one (2, w) sliced gather for the two y-adjacent node rows:
  **5,242.8 ms/1M** vs 19.1 ms for four flat row gathers (the vmapped
  ``dynamic_slice`` lowers ~3x worse); pinned XLA-only.
- ``pallas_eval_df.bicubic_df_tail`` (nested 5-Hermite form) —
  67.2 ms/1M; still SHIPPED as the guarded-XLA CPU/oracle tail, only
  its Mosaic use is superseded by the MXU form.
- f32 streaming/MXU tails in ``ops/pallas_tail.py``
  (``bicubic_weight_tail``, ``bicubic_mxu_tail``, ``banked_tail``,
  ``fused_lerp_tail``) — each docstring carries its losing number.

Round-5 measured negatives recorded WITHOUT variant code (the
measurement IS the record; benches/ablate_f48_vs_df.py reproduces):

- **The f48 tier has no time story at narrow rows — memory only.**
  Head-to-head on identical prepacked routes (1M queries):
  bilinear DF 23.09 ms / f48 23.22 (tables 128 / 96 MB);
  ND tricubic 64³ DF 36.63 / f48 36.87 (122 / 92 MB).  The 25% byte
  cut buys nothing because the random gather is ACCESS/locality-bound
  at these row widths (384–512 B; see BASELINE.md round-5 gather law),
  and the tails cost the same (the bf16 lo still needs every EFT stage
  to hold ~2^-33).  The verdict-suggested cheaper f48 search also has
  no budget: the full DF (idx, t) pass measures 1.47 ms vs 1.40 for
  the f32 kernel — the DF compare/refine is ~free.  The tier's value
  is capacity (75% tables) and stands; pick it for memory, not speed.
  At WIDE rows (bicubic: 2 KB DF vs 1.5 KB f48) bytes start to bind
  and f48 shows its only real time edge (~7%, standing rows
  NS3d/NS3f).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .df import fast_two_sum, two_prod, two_sum
from .pallas_eval_df import _df_bicubic_weights


def _df_bicubic_weight_tail(rows, txh, txl, tyh, tyl, bp):
    """Weight-form DF bicubic tail body: per-query DF weights, one EFT
    product per cell-row block, compensated sequential accumulation.

    MEASURED NEGATIVE RESULT (round 3, NS3d 1M queries): 94.7 ms at
    bq=256 vs 67.2 ms for the nested form
    (``pallas_eval_df._df_bicubic_tail``) — the 32 sub-lane (B, bp) row
    slices live lane-padded and the serial compensated chain costs more
    than the weight algebra saves.  An earlier lane-packed full-row form
    (one ``two_prod`` across the whole (B, 32*bp) row + 5 tree levels)
    measured 52.3 ms but its full-row temporaries exceed scoped VMEM at
    bq=512 (19.3–28.1 MB, three forms measured) and its 16-piece
    sub-128-lane concats relayout.  The MXU one-hot weight-row build
    (``pallas_eval_df._df_bicubic_weight_tail_mxu``, 47.8 ms full route)
    fixed both and is the route default.  Kept (with tests) as the
    record.  Hi products and hi sums are exact (EFT); residuals
    accumulate in plain f32 at ~2^-48 of term scale — same grade as the
    nested form, different last-bit rounding."""
    b = rows.shape[0]
    ch = rows.shape[1]
    tx = (txh, txl)
    ty = (tyh, tyl)
    one = (jnp.ones_like(txh), jnp.zeros_like(txh))
    w16 = _df_bicubic_weights(tx, ty, one)
    from . import df as _dfmod

    if _dfmod._GUARDED:
        # XLA fallback: per-block (B, 1) x (B, bp) two_prods — the ONE
        # broadcast pattern pinned safe against the XLA:CPU emitter's
        # FMA contraction (two_prod materializes the broadcast through
        # the integer domain internally).  Building lane-packed weight
        # rows out of broadcast_to + concatenate instead collapses the
        # Veltkamp splits below HLO no matter where the barriers go —
        # measured 7e-8 for plain, bitcast-after-concat, AND
        # materialize-per-piece variants, vs ~1e-13 for this form.
        ps, es = [], []
        for j in range(32):
            w = w16[j % 16]
            blk = rows[:, j * bp : (j + 1) * bp]
            p, pe = two_prod(w[0], blk)
            ps.append(p)
            es.append(pe + w[1] * blk)
        while len(ps) > 1:
            nps, nes = [], []
            for j in range(0, len(ps), 2):
                s, se = two_sum(ps[j], ps[j + 1])
                nps.append(s)
                nes.append(es[j] + es[j + 1] + se)
            ps, es = nps, nes
        return fast_two_sum(ps[0], es[0])

    # Mosaic: per-block broadcast EFT products + a compensated tree
    # reduce.  Mosaic broadcasts (B, 1) weights against (B, bp) blocks
    # natively (the nested tail leans on the same), the hi/lo block
    # pair shares its weight's Veltkamp split, and nothing is
    # concatenated: lane-packing the weights into full rows measured
    # worse (52.3 ms NS3d — the 16-piece sub-128-lane concats and
    # broadcast_to relayout) and its full-row temporaries OOM scoped
    # VMEM at bq=512 (19.3-20.9 MB, two forms measured).
    del ch

    def split(a):  # Veltkamp (no guards: Mosaic preserves the EFTs)
        c = a * jnp.asarray(4097.0, a.dtype)
        hi = c - (c - a)
        return hi, a - hi

    # Sequential compensated accumulation, NOT a tree: sub-128-lane
    # (B, bp) arrays are stored lane-padded in VMEM, so a tree keeping
    # 2x32 of them live costs 28 MB scoped at bq=512 (measured OOM);
    # the running (s, e) pair keeps ~4 live.  two_sum is exact in any
    # association, so the order change costs nothing.
    s = e = None
    for bidx in range(16):
        w = w16[bidx]
        wh, wl = split(w[0])
        for off in (0, 16):  # hi block, then its lo twin
            j = bidx + off
            blk = rows[:, j * bp : (j + 1) * bp]
            p = w[0] * blk
            bh, bl = split(blk)
            err = ((wh * bh - p) + wh * bl + wl * bh) + wl * bl
            err = err + w[1] * blk
            if s is None:
                s, e = p, err
            else:
                s, se = two_sum(s, p)
                e = e + (err + se)
    return fast_two_sum(s, e)


def _df_bicubic_weight_kernel(
    rows_ref, txh_ref, txl_ref, tyh_ref, tyl_ref, outh_ref, outl_ref, *, bp
):
    from .df import no_guard

    with no_guard():
        out = _df_bicubic_weight_tail(
            rows_ref[:], txh_ref[:], txl_ref[:], tyh_ref[:], tyl_ref[:], bp
        )
        outh_ref[:] = out[0]
        outl_ref[:] = out[1]


def bicubic_df_tail_w(rows, txh, txl, tyh, tyl, interpret=False, bq=256):
    """Weight-form streaming Mosaic DF bicubic tail (see
    ``_df_bicubic_weight_tail``); same contract as
    ``pallas_eval_df.bicubic_df_tail``.  bq=256: even with the
    sequential accumulation keeping ~4 live (B, bp) arrays, the r=16
    plan measures 17.46 MB scoped VMEM at bq=512 (the 32 lane-padded
    row slices dominate) — one block size down fits; the lane-packed
    full-row forms measured 19.3–28.1 MB across three variants and are
    gone."""
    nq, ch = rows.shape
    bp = ch // 32
    assert nq % bq == 0
    nb = nq // bq
    outh, outl = pl.pallas_call(
        functools.partial(_df_bicubic_weight_kernel, bp=bp),
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
