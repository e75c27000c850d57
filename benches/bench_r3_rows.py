"""Round-3 bench rows: the reworked bicubic NS3b eval and the DF banked
gather route ("10k-knot x64 bank DF EVAL").

Run: timeout 580 python benches/bench_r3_rows.py
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
from ndarray_interp_tpu.models.interp2d import Interp2D
from ndarray_interp_tpu.models.strategies.bicubic import Bicubic
from ndarray_interp_tpu.ops.df import df_from_f64
from ndarray_interp_tpu.ops.pallas_eval_df import gathered_bank_eval_df
from ndarray_interp_tpu.ops.pallas_tail import gathered_bank_eval
from ndarray_interp_tpu.ops.pallas_eval import fused_index_frac


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)

    # NS3b: bicubic (512, 512, 16), 1M queries — round-3 eval
    g_shape = (512, 512, 16)
    grid = jnp.asarray(rng.normal(size=g_shape).astype(np.float32))
    x = jnp.arange(g_shape[0], dtype=jnp.float32)
    y = jnp.arange(g_shape[1], dtype=jnp.float32)
    nq = 1_000_000
    qx = jnp.asarray(rng.uniform(0, g_shape[0] - 1, nq).astype(np.float32))
    qy = jnp.asarray(rng.uniform(0, g_shape[1] - 1, nq).astype(np.float32))
    strat = jax.jit(
        lambda x_, y_, d_: Bicubic(extrapolate=True).build(x_, y_, d_)
    )(x, y, grid)
    itp = Interp2D.new_unchecked(x, y, grid, strat)
    print(
        f"NS3b rows: {strat.rows.shape} = "
        f"{strat.rows.size * 4 / 1e6:.0f} MB, layout={strat.layout}"
    )
    t = device_timer(
        lambda q1, q2, i_: i_.strategy.eval(i_, q1, q2),
        (qx, qy, itp), var=0, links=4, reps=3,
    )
    print(f"NS3b bicubic (512,512,16) 1M q (round-3 eval): {t*1e3:.2f} ms")

    # DF banked gather route vs f32 gather route, 10k knots x 64 bank, 1M q
    n, bank = 10240, 64
    x64 = np.linspace(0.0, 1.0, n)
    d64 = rng.normal(size=(n, bank))
    a64 = rng.normal(size=(n - 1, bank))
    b64 = rng.normal(size=(n - 1, bank))
    q64 = rng.uniform(0.0, 1.0, nq)
    dfargs = []
    for v in (x64, d64, a64, b64):
        dfargs.extend(jnp.asarray(w) for w in df_from_f64(v))
    qh, ql = (jnp.asarray(w) for w in df_from_f64(q64))

    def df_run(qh, ql, _d):
        return gathered_bank_eval_df(*dfargs[:8], qh, ql)

    t_df = device_timer(df_run, (qh, ql, dfargs[2]), var=0, links=2, reps=3)
    print(f"DF banked gather route 10k x 64, 1M q: {t_df*1e3:.2f} ms")

    # f32 gather route on the same workload for the cost multiplier
    xf = dfargs[0]  # hi half == f32 rounding of x64
    d2 = dfargs[2]
    a2 = dfargs[4]
    b2 = dfargs[6]
    qf = qh

    def f32_run(qf, _d):
        idx, t_ = fused_index_frac(xf, qf)
        return gathered_bank_eval(d2, a2, b2, idx, t_)

    t_f32 = device_timer(f32_run, (qf, d2), var=0, links=2, reps=3)
    print(
        f"f32 gather route same workload: {t_f32*1e3:.2f} ms "
        f"(DF multiplier {t_df/t_f32:.2f}x)"
    )


if __name__ == "__main__":
    main()
