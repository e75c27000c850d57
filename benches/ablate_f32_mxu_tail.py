"""NS3b round 4: the f32 MXU weight-form Mosaic tail, measured.

VERDICT r3 weak #3: the round-3 f32 Mosaic tails (per-block broadcast
30.0 ms, lane-packed 27.7) lost to the shipped XLA nested tail
(16.2 ms), but neither used the MXU weight-row form that won the DF
routes (bicubic_df_tail_mxu, 47.8 vs 67.2).  This ablation measures the
f32 analogue (ops/pallas_tail.py:bicubic_mxu_tail) head-to-head on the
NS3b workload (512x512x16 grid, 1M queries): either it lands ~11 ms or
the re-stream argument gets its recorded measurement.

Run: timeout 580 python benches/ablate_f32_mxu_tail.py
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
from ndarray_interp_tpu.models.strategies.bicubic import (
    _cell_tail_nested,
    bicubic_node_grids,
    pack_bicubic_rows,
)
from ndarray_interp_tpu.ops.pallas_eval import fused_index_frac
from ndarray_interp_tpu.ops.pallas_tail import bicubic_mxu_tail


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    g_shape = (512, 512, 16)
    grid = jnp.asarray(rng.normal(size=g_shape).astype(np.float32))
    x = jnp.arange(g_shape[0], dtype=jnp.float32)
    y = jnp.arange(g_shape[1], dtype=jnp.float32)
    nq = 1_000_000
    npad = -(-nq // 2048) * 2048  # block-multiple for every bq tried
    qx = jnp.asarray(rng.uniform(0, g_shape[0] - 1, npad).astype(np.float32))
    qy = jnp.asarray(rng.uniform(0, g_shape[1] - 1, npad).astype(np.float32))
    ny, r = g_shape[1], 16

    kx, ky, kxy = jax.jit(bicubic_node_grids)(x, y, grid)
    rows = jax.jit(pack_bicubic_rows)(x, y, grid, kx, ky, kxy)
    print(f"rows table: {rows.shape}, {rows.nbytes/2**20:.0f} MB", flush=True)

    def ship(qx, qy, r_):  # shipped: gather + XLA nested tail
        xi, tx = fused_index_frac(x, qx)
        yi, ty = fused_index_frac(y, qy)
        g = jnp.take(r_, xi * (ny - 1) + yi, axis=0)
        return _cell_tail_nested(g, tx[:, None], ty[:, None], r)

    def mxu(bq):
        def f(qx, qy, r_):
            xi, tx = fused_index_frac(x, qx)
            yi, ty = fused_index_frac(y, qy)
            g = jnp.take(r_, xi * (ny - 1) + yi, axis=0)
            return bicubic_mxu_tail(g, tx, ty, bq=bq)

        return f

    stages = [("ship  gather+XLA nested ", ship)]
    for bq in (512, 1024, 2048):
        stages.append((f"mxu   gather+MXU bq={bq:<4}", mxu(bq)))
    for name, fn in stages:
        t = device_timer(fn, (qx, qy, rows), var=0, links=4, reps=3)
        print(f"{name}: {t * 1e3:8.2f} ms /1M queries", flush=True)

    # tail alone on pre-gathered rows (1 GB resident)
    xi, tx = jax.jit(lambda q: fused_index_frac(x, q))(qx)
    yi, ty = jax.jit(lambda q: fused_index_frac(y, q))(qy)
    g = jax.jit(lambda r_, c: jnp.take(r_, c, axis=0))(
        rows, xi * (ny - 1) + yi
    )

    def tail_nested(tx, ty, g_):
        return _cell_tail_nested(g_, tx[:, None], ty[:, None], r)

    t = device_timer(tail_nested, (tx, ty, g), var=0, links=4, reps=3)
    print(f"tail  XLA nested alone   : {t * 1e3:8.2f} ms /1M", flush=True)
    for bq in (512, 1024, 2048):
        def tail_mxu(tx, ty, g_, bq=bq):
            return bicubic_mxu_tail(g_, tx, ty, bq=bq)

        t = device_timer(tail_mxu, (tx, ty, g), var=0, links=4, reps=3)
        print(f"tail  MXU bq={bq:<5} alone : {t * 1e3:8.2f} ms /1M",
              flush=True)


if __name__ == "__main__":
    main()
