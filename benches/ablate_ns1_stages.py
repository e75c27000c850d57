"""NS1 round 5: glue-corrected stage anatomy of the 1-D fused kernel.

VERDICT r4 task 1: NS1 (1M queries, 2k-knot cubic, the scoreboard row)
sits at 1.00 ms vs a 0.37 ms MXU one-hot fetch model — ~35% of model,
the largest relative headroom of any shipped row — and the roofline's
"fetch-bound" label contradicts ROADMAP's round-3 tall-operand result
(neutral => not fetch-utilization-bound).  This ablation truncates the
ROUND-4 kernel shape (the 2Wp+2W = 96-row wp-padded operand, preserved
here as the anatomized artifact; the shipped ops/pallas_eval.py:_kernel
moved to the tight 73-row operand this anatomy motivated) stage by
stage on the NS1 workload so every millisecond has an owner:

  V0 glue       q -> out copy (DMA + per-step overhead floor)
  V1 coarse     V0 + (C-1)-leader compare + axis-0 sum
  V2 1-pass     V1 + one-hot build + ONE bf16 MXU pass
  V3 fetch      V1 + one-hot build + all THREE passes (shipped fetch)
  V4 fine       V3 + W-row fine compare + sum
  V5 select     V4 + oh_l + the six W-row mask+reduce selects
  V6 full       the shipped kernel body

Deltas: coarse = V1-V0; MXU pass = (V3-V2)/2; one-hot build =
V2-V1-pass; fine = V4-V3; selects = V5-V4; Hermite tail = V6-V5.

Run: timeout 580 python benches/ablate_ns1_stages.py
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benches.run_benches import device_timer
from ndarray_interp_tpu.ops.pallas_eval import (
    _dot3,
    _pack_windows,
    _plan,
    _split3,
    make_interval_table,
)
from ndarray_interp_tpu.models.strategies.cubic import CubicSpline
from ndarray_interp_tpu.models.interp1d import Interp1D


def _stage_kernel(lead_ref, th_ref, tm_ref, tl_ref, q_ref, out_ref,
                  *, n, w, c, wp, stage):
    f32 = jnp.float32
    q = q_ref[:]
    if stage == 0:  # glue
        out_ref[:] = q + f32(1.0)
        return

    cmp1 = (lead_ref[:] <= q).astype(f32)
    coarse = jnp.sum(cmp1, axis=0, keepdims=True)
    cmax = float((n - 2) // w)
    cidx = jnp.minimum(coarse, cmax)
    if stage == 1:  # coarse
        out_ref[:] = cidx
        return

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, q.shape[1]), 0)
    oh1 = (iota_c == cidx.astype(jnp.int32)).astype(jnp.bfloat16)
    if stage == 2:  # one bf16 MXU pass
        win1 = jnp.dot(th_ref[:], oh1, preferred_element_type=f32)
        out_ref[:] = win1[0:1]
        return

    win = _dot3(th_ref[:], tm_ref[:], tl_ref[:], oh1)
    if stage == 3:  # full fetch
        out_ref[:] = win[0:1]
        return

    win_x = win[:wp]
    win_d = win[wp: 2 * wp]
    win_ab = win[2 * wp:]
    fine = jnp.sum((win_x[:w] <= q).astype(f32), axis=0, keepdims=True)
    pred = cidx * float(w) + fine - 1.0
    pos = jnp.clip(pred, 0.0, float(n - 2)) - cidx * float(w)
    if stage == 4:  # fine
        out_ref[:] = pos
        return

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, q.shape[1]), 0)
    oh_l = (iota_w == pos.astype(jnp.int32)).astype(f32)
    x_l = jnp.sum(win_x[:w] * oh_l, axis=0, keepdims=True)
    x_r = jnp.sum(win_x[1: w + 1] * oh_l, axis=0, keepdims=True)
    y_l = jnp.sum(win_d[:w] * oh_l, axis=0, keepdims=True)
    y_r = jnp.sum(win_d[1: w + 1] * oh_l, axis=0, keepdims=True)
    a = jnp.sum(win_ab[:w] * oh_l, axis=0, keepdims=True)
    b = jnp.sum(win_ab[w:] * oh_l, axis=0, keepdims=True)
    if stage == 5:  # selects
        out_ref[:] = x_l + x_r + y_l + y_r + a + b
        return

    t = (q - x_l) / (x_r - x_l)
    one = f32(1.0)
    base = (one - t) * y_l + t * y_r + t * (one - t) * (a * (one - t) + b * t)
    lin_inf = jnp.isinf(t) & (a == f32(0.0)) & (b == f32(0.0))
    out_ref[:] = jnp.where(lin_inf, y_l + t * (y_r - y_l), base)


def staged_eval(knots, tbl, q, stage):
    n = knots.shape[0]
    nq = q.shape[0]
    w, c, B = _plan(n)
    data = jnp.concatenate([tbl[:, 2], tbl[-1:, 3]])
    a, b = tbl[:, 4], tbl[:, 5]
    wp = -(-(w + 1) // 16) * 16
    lead, kwin, dwin, abblk = _pack_windows(knots, data, a, b, w, c, wp)
    tall = jnp.concatenate([kwin, dwin, abblk], axis=0)
    th, tm, tl = _split3(tall)
    nb = (nq + B - 1) // B
    qpad = jnp.pad(q, (0, nb * B - nq)).reshape(1, nb * B)
    rows = 2 * wp + 2 * w
    kern = functools.partial(_stage_kernel, n=n, w=w, c=c, wp=wp, stage=stage)
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
        out_specs=pl.BlockSpec((1, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nb * B), jnp.float32),
    )(lead, th, tm, tl, qpad)
    return out.reshape(nb * B)[:nq]


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(11)
    n = 2048
    nq = 1_000_000
    x = jnp.asarray(np.sort(rng.uniform(0, 100, n)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=n).astype(np.float32))
    lo, hi = float(x[0]), float(x[-1])
    q = jnp.asarray(rng.uniform(lo, hi, nq).astype(np.float32))

    it = Interp1D.builder(y).x(x).strategy(CubicSpline()).build()
    st = it.strategy
    tbl = make_interval_table(x, y, st.a, st.b)

    # sanity: full staged kernel == shipped row values
    full = staged_eval(x, tbl, q[:4096], 6)
    ship = it.interp_array(q[:4096])
    assert np.array_equal(np.asarray(full), np.asarray(ship)), "stage-6 mismatch"
    print("stage-6 bit-exact vs shipped", flush=True)

    names = {0: "glue", 1: "coarse", 2: "1-pass", 3: "fetch",
             4: "fine", 5: "select", 6: "full"}
    times = {}
    for stage in range(7):
        fn = functools.partial(staged_eval, stage=stage)
        ms = device_timer(lambda k, t, qq: fn(k, t, qq), (x, tbl, q),
                          var=2, links=24, reps=4) * 1e3
        times[stage] = ms
        print(f"V{stage} {names[stage]:8s} {ms:7.3f} ms", flush=True)

    g = times[0]
    passes = (times[3] - times[2]) / 2
    print("\n--- glue-corrected anatomy (ms per 1M queries) ---")
    print(f"glue/DMA floor      {g:7.3f}")
    print(f"coarse compare+sum  {times[1] - times[0]:7.3f}")
    print(f"one-hot build       {times[2] - times[1] - passes:7.3f}")
    print(f"MXU fetch (3 pass)  {3 * passes:7.3f}  ({passes:.3f}/pass)")
    print(f"fine compare+sum    {times[4] - times[3]:7.3f}")
    print(f"six selects         {times[5] - times[4]:7.3f}")
    print(f"Hermite tail        {times[6] - times[5]:7.3f}")
    print(f"sum of stages       {times[6]:7.3f}  (shipped row ~1.00)")


if __name__ == "__main__":
    main()
