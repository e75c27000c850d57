"""NS3c/ND3 round 5: stage anatomy of the 2-D / ND double-float routes.

VERDICT r4 task 2: the DF multipliers are uneven and unexplained —
banked 1-D 2.08x, bilinear 3.4x (27.95 vs 8.19 ms), ND tricubic 7.3x
(69.3 vs 8.7 ms) — and no 2-D/ND DF route has a recorded ablation.
This script times each stage of the NS3c workload (512x512x16 grid,
1M 2-D queries) and the ND3 workload (64^3 tricubic, 1M 3-D queries):

  bilinear DF:  pack | DF (idx,t) x2 | cell gather | Mosaic DF tail
  f32 contrast: fused_cell_index | gather | lerp tail
  ND DF:        DF (idx,t) x3 | cell gather | k-fold DF tensor tail

Contract anchored: cubic_spline.rs:818-828 per-axis Hermite chain.

Run: timeout 580 python benches/ablate_df2d.py
"""

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
from ndarray_interp_tpu.ops.pallas_eval import fused_cell_index
from ndarray_interp_tpu.ops.pallas_eval_df import (
    _df_index_frac_2d,
    bilinear_df_tail,
    gathered_bilinear_eval_df,
    gathered_bilinear_eval_df_packed,
    pack_bilinear_rows_df,
)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(7)
    g_shape = (512, 512, 16)
    nq = 1_000_000
    npad = -(-nq // 512) * 512
    grid64 = rng.normal(size=g_shape)
    x64 = np.arange(g_shape[0], dtype=np.float64)
    y64 = np.arange(g_shape[1], dtype=np.float64)
    qx64 = rng.uniform(0, g_shape[0] - 1, npad)
    qy64 = rng.uniform(0, g_shape[1] - 1, npad)

    xh, xl = (jnp.asarray(v) for v in df_from_f64(x64))
    yh, yl = (jnp.asarray(v) for v in df_from_f64(y64))
    zh, zl = (jnp.asarray(v) for v in df_from_f64(grid64))
    qxh, qxl = (jnp.asarray(v) for v in df_from_f64(qx64))
    qyh, qyl = (jnp.asarray(v) for v in df_from_f64(qy64))

    ny = g_shape[1]
    r = g_shape[2]

    t = device_timer(pack_bilinear_rows_df, (zh, zl), var=0, links=4) * 1e3
    print(f"pack_bilinear_rows_df        {t:7.3f} ms", flush=True)

    packed = jax.jit(pack_bilinear_rows_df)(zh, zl)
    print(f"packed table: {packed.shape} {packed.nbytes/2**20:.0f} MB",
          flush=True)

    def search(a, b, c, d):
        return _df_index_frac_2d(xh, xl, yh, yl, a, b, c, d)

    t = device_timer(search, (qxh, qxl, qyh, qyl), var=0, links=8) * 1e3
    print(f"DF (idx,t) x2 axes           {t:7.3f} ms", flush=True)

    # f32 contrast: the one-pass fused cell kernel
    x32 = jnp.asarray(x64, jnp.float32)
    y32 = jnp.asarray(y64, jnp.float32)
    qx32 = jnp.asarray(qx64, jnp.float32)
    qy32 = jnp.asarray(qy64, jnp.float32)
    t = device_timer(fused_cell_index, (x32, y32, qx32, qy32),
                     var=2, links=8) * 1e3
    print(f"f32 fused_cell_index         {t:7.3f} ms", flush=True)

    # gather alone (cells precomputed outside the timed chain; the
    # packed table rides as an ARGUMENT — the round-5 trace-time
    # hygiene guard rejects closure-captured >=8 MB tables, by design)
    xi, _, _, yi, _, _ = jax.jit(search)(qxh, qxl, qyh, qyl)
    cells = jax.jit(lambda a, b: a * (ny - 1) + b)(xi, yi)

    def gather(pk, cells_f):
        return jnp.take(pk, cells_f, axis=0)

    t = device_timer(gather, (packed, cells), var=0, links=4) * 1e3
    print(f"packed-row gather (512B)     {t:7.3f} ms", flush=True)

    # DF tails alone on pre-gathered rows: the round-4 lerp-form
    # kernel vs the round-5 MXU weight form (shipped)
    rows = jax.jit(gather)(packed, cells)
    _, txh, txl, _, tyh, tyl = jax.jit(search)(qxh, qxl, qyh, qyl)

    from ndarray_interp_tpu.ops.pallas_eval_df import bilinear_df_tail_mxu

    for name, tail in (("lerp-form (round 4)", bilinear_df_tail),
                       ("MXU weight form    ", bilinear_df_tail_mxu)):
        t = device_timer(tail, (rows, txh, txl, tyh, tyl),
                         var=1, links=4) * 1e3
        print(f"DF tail {name}  {t:7.3f} ms", flush=True)

    # packed route end to end (no pack in the chain)
    def full_packed(pk, a, b, c, d):
        return gathered_bilinear_eval_df_packed(
            xh, xl, yh, yl, pk, ny, r, a, b, c, d
        )

    t = device_timer(full_packed, (packed, qxh, qxl, qyh, qyl),
                     var=1, links=4) * 1e3
    print(f"full route (prepacked)       {t:7.3f} ms", flush=True)

    # the standing-row form (pack inside, links=2 as in run_benches;
    # z rides as ARGUMENTS — the raw-route guard rejects captures)
    def full(a, b, c, d, zh_, zl_):
        return gathered_bilinear_eval_df(xh, xl, yh, yl, zh_, zl_, a, b, c, d)

    t = device_timer(full, (qxh, qxl, qyh, qyl, zh, zl), var=0, links=2) * 1e3
    print(f"standing row form (links=2)  {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
