"""NS1 round 5, part 2: route overhead + grid-step floor scaling.

The staged kernel body (ablate_ns1_stages.py V6) measures 0.805 ms on
the NS1 workload while the shipped row measures ~1.00 ms.  This script
locates the difference: the interpolator ``__call__`` route, the
``custom_partitioning`` wrapper, and trace-time packing are peeled in
turn, and the glue/DMA floor (V0, 0.26 ms) is measured at different
query-lane block sizes B to separate per-grid-step overhead from
per-byte DMA cost.

Run: timeout 580 python benches/ablate_ns1_route.py
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
from benches.ablate_ns1_stages import _stage_kernel
from ndarray_interp_tpu.ops.pallas_eval import (
    _fused_eval_impl,
    _pack_windows,
    _plan,
    _split3,
    fused_eval_1d,
    make_interval_table,
)
from ndarray_interp_tpu.models.strategies.cubic import CubicSpline, CubicSplineStrategy
from ndarray_interp_tpu.models.interp1d import Interp1D


def staged_eval_b(knots, tbl, q, stage, B):
    n = knots.shape[0]
    nq = q.shape[0]
    w, c, _ = _plan(n)
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
    x = jnp.asarray(np.linspace(0, 100, n).astype(np.float32))
    y = jnp.asarray(rng.normal(size=n).astype(np.float32))
    q = jnp.asarray(rng.uniform(0, 100, nq).astype(np.float32))

    strat = CubicSpline().extrapolate(True)
    built = strat.build(x, y)
    itp = Interp1D.new_unchecked(x, y, CubicSplineStrategy(built.a, built.b, "yes"))
    tbl = make_interval_table(x, y, built.a, built.b)

    # (a) the benched route: itp(q) under jit (exactly run_benches.py:225)
    f = jax.jit(lambda t_, qq: t_(qq))
    ms = device_timer(f, (itp, q), var=1, links=24) * 1e3
    print(f"route itp(q)                 {ms:7.3f} ms", flush=True)

    # (b) fused_eval_1d (partition wrapper, no driver)
    ms = device_timer(fused_eval_1d, (x, tbl, q), var=2, links=24) * 1e3
    print(f"fused_eval_1d (partitioned)  {ms:7.3f} ms", flush=True)

    # (c) raw impl (no partition wrapper)
    ms = device_timer(_fused_eval_impl, (x, tbl, q), var=2, links=24) * 1e3
    print(f"_fused_eval_impl (raw)       {ms:7.3f} ms", flush=True)

    # (d) glue (stage 0) and full (stage 6) vs block size B
    for stage in (0, 6):
        for B in (4096, 8192, 16384):
            try:
                fn = functools.partial(staged_eval_b, stage=stage, B=B)
                ms = device_timer(lambda k, t, qq: fn(k, t, qq), (x, tbl, q),
                                  var=2, links=24) * 1e3
                print(f"stage {stage} B={B:5d}            {ms:7.3f} ms",
                      flush=True)
            except Exception as e:  # VMEM OOM expected at large B
                print(f"stage {stage} B={B:5d}            FAILED: "
                      f"{str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
