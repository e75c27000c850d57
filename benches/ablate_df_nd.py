"""ND3 round 5: stage anatomy of the DF InterpND route (VERDICT r4
task 2, the 7.3x multiplier).  Workload = the ND3 standing row:
tricubic 64^3 grid, r=1, 1M queries, f64-grade DF.

Stages: 3x DF (idx,t) Pallas passes | ONE packed (hi,lo) cell-row
gather (4 KB rows -> ~4 GB traffic: the byte wall) | the Mosaic MXU
weight-form tail at several block sizes.  Contract anchored:
cubic_spline.rs:818-828 per-axis chain, on-chip 4e-12 gate
(test_df_nd_route_f64_grade_on_chip).

Run: timeout 580 python benches/ablate_df_nd.py
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

from benches.run_benches import device_timer
from ndarray_interp_tpu.ops.df import df_from_f64
from ndarray_interp_tpu.ops.pallas_eval_df_nd import (
    _df_index_frac_nd,
    gathered_nd_eval_df_packed,
    nd_df_tail_mxu,
    pack_rows_nd_df,
)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(7)
    n3, r, k = 64, 1, 3
    nq = 1_000_000
    npad = -(-nq // 1024) * 1024
    ncells = (n3 - 1) ** 3
    rows64 = rng.normal(size=(ncells, (4 ** k) * r))
    rh, rl = (jnp.asarray(np.asarray(v, np.float32)) for v in df_from_f64(rows64))
    packed = jax.jit(lambda h, l: pack_rows_nd_df(h, l, 4 ** k, r))(rh, rl)
    print(f"packed table {packed.shape} {packed.nbytes/2**20:.0f} MB",
          flush=True)

    axes_pairs = []
    for _ in range(3):
        a64 = np.linspace(0.0, 1.0, n3)
        axes_pairs.append(tuple(
            jnp.asarray(np.asarray(v, np.float32)) for v in df_from_f64(a64)
        ))
    q_flat = []
    for _ in range(3):
        q64 = rng.uniform(0, 1, npad)
        q_flat.extend(
            jnp.asarray(np.asarray(v, np.float32)) for v in df_from_f64(q64)
        )
    q_flat = tuple(q_flat)

    def search(*qs):
        return _df_index_frac_nd(axes_pairs, qs)

    t = device_timer(search, q_flat, var=0, links=8) * 1e3
    print(f"DF (idx,t) x3 axes           {t:7.3f} ms", flush=True)

    outs = jax.jit(search)(*q_flat)
    idxs = [outs[3 * d] for d in range(3)]
    ts = []
    for d in range(3):
        ts.extend([outs[3 * d + 1], outs[3 * d + 2]])
    cells = jax.jit(
        lambda a, b, c: (a * (n3 - 1) + b) * (n3 - 1) + c
    )(*idxs)

    def gather(pk, cells_):
        return jnp.take(pk, cells_, axis=0)

    t = device_timer(gather, (packed, cells), var=0, links=2) * 1e3
    print(f"cell-row gather (4 KB rows)  {t:7.3f} ms", flush=True)

    rows = jax.jit(gather)(packed, cells)

    for bq in (256, 512, 1024):
        fn = functools.partial(nd_df_tail_mxu, k=k, nbasis=4, bq=bq)

        def tail(rw, *tflat):
            return fn(rw, tflat)

        try:
            t = device_timer(tail, (rows,) + tuple(ts), var=1, links=2) * 1e3
            print(f"MXU ND tail bq={bq:4d}          {t:7.3f} ms", flush=True)
        except Exception as e:
            print(f"MXU ND tail bq={bq:4d}          FAILED "
                  f"{str(e).splitlines()[0][:90]}", flush=True)

    route = gathered_nd_eval_df_packed(k, (n3,) * 3, r, nbasis=4)
    args = []
    for p in axes_pairs:
        args.extend(p)
    args.append(packed)
    args.extend(q_flat)

    def df_run(*a):
        hi, lo = route(*a)
        return hi + lo

    t = device_timer(df_run, tuple(args), var=len(args) - 6, links=2) * 1e3
    print(f"full route                   {t:7.3f} ms (standing row 69.3)",
          flush=True)


if __name__ == "__main__":
    main()
