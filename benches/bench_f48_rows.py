"""Standing-row capture for the f48 tier family: NS3f (bicubic cell,
512x512x16) and ND3b (tricubic 64^3) alongside their DF twins — the
bank twin (NS2d) is captured by benches/bench_ns2d.py.

Run: timeout 580 python benches/bench_f48_rows.py
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
from ndarray_interp_tpu.ops.pallas_eval_df import (
    gathered_bicubic_eval_f48_packed,
    pack_bicubic_rows_f48,
)
from ndarray_interp_tpu.ops.pallas_eval_df_nd import (
    gathered_nd_eval_df_packed,
    pack_rows_nd_f48,
)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    nq = 1_000_000
    dtype = jnp.float32

    # ---- NS3f: bicubic f48 on the NS3 grid --------------------------------
    from ndarray_interp_tpu.models.strategies.bicubic import Bicubic

    g_shape = (512, 512, 16)
    grid3 = jnp.asarray(rng.normal(size=g_shape).astype(np.float32), dtype)
    x3b = jnp.asarray(np.arange(g_shape[0], dtype=np.float32), dtype)
    y3b = jnp.asarray(np.arange(g_shape[1], dtype=np.float32), dtype)
    strat3b = jax.jit(
        lambda x_, y_, d_: Bicubic(extrapolate=True).build(x_, y_, d_)
    )(x3b, y3b, grid3)
    r3d = g_shape[2]
    rows_pair = df_from_f64(np.asarray(strat3b.rows, np.float64))
    packed3f = jax.jit(
        lambda h, l: pack_bicubic_rows_f48(h, l, r3d)
    )(*(jnp.asarray(v) for v in rows_pair))
    xy_pairs = []
    for v in (
        np.arange(g_shape[0], dtype=np.float64),
        np.arange(g_shape[1], dtype=np.float64),
    ):
        xy_pairs.extend(jnp.asarray(w) for w in df_from_f64(v))
    qx3h, qx3l = (
        jnp.asarray(w)
        for w in df_from_f64(rng.uniform(0, g_shape[0] - 1, nq))
    )
    qy3h, qy3l = (
        jnp.asarray(w)
        for w in df_from_f64(rng.uniform(0, g_shape[1] - 1, nq))
    )

    def f48_run(a, b, c, d, packed):
        return gathered_bicubic_eval_f48_packed(
            *xy_pairs, packed, a, b, c, d, r=r3d
        )

    t = device_timer(
        f48_run, (qx3h, qx3l, qy3h, qy3l, packed3f), var=0, links=2
    )
    print(
        f"NS3f bicubic f48 {g_shape}: {t*1e3:.2f} ms/1M  "
        f"packed table {packed3f.size * 4 / 1e6:.0f} MB "
        f"(DF is {packed3f.size * 4 / 3 * 4 / 1e6:.0f} MB)",
        flush=True,
    )

    # ---- ND3b: tricubic 64^3 f48 ------------------------------------------
    n3, r, k = 64, 1, 3
    sizes = (n3,) * 3
    ncells = (n3 - 1) ** 3
    rows64 = rng.normal(size=(ncells, (4**k) * r))
    rh, rl = (
        jnp.asarray(np.asarray(v, np.float32)) for v in df_from_f64(rows64)
    )
    packed48 = jax.jit(lambda h, l: pack_rows_nd_f48(h, l, 4**k, r))(rh, rl)
    args = []
    for a in (np.linspace(0.0, 1.0, n3) for _ in range(3)):
        args.extend(
            jnp.asarray(np.asarray(v, np.float32)) for v in df_from_f64(a)
        )
    args.append(packed48)
    qi = len(args)
    for _ in range(3):
        q64 = rng.uniform(0, 1, nq)
        args.extend(
            jnp.asarray(np.asarray(v, np.float32)) for v in df_from_f64(q64)
        )
    route48 = gathered_nd_eval_df_packed(k, sizes, r, nbasis=4, tier="f48")

    def nd_run(*a):
        hi, lo = route48(*a)
        return hi + lo

    t = device_timer(nd_run, tuple(args), var=qi, links=4)
    print(
        f"ND3b f48 tricubic 64^3 (~2^-33 tier): {t*1e3:.2f} ms/1M  "
        f"packed table {packed48.size * 4 / 1e6:.0f} MB",
        flush=True,
    )


if __name__ == "__main__":
    main()
