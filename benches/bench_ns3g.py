"""NS3g: the bilinear f48 tier on the NS3c workload (512x512x16 grid,
1M 2-D queries) — bf16-lo packed corner rows, 75% of the DF table.

Run: timeout 580 python benches/bench_ns3g.py
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
    gathered_bilinear_eval_f48_packed,
    pack_bilinear_rows_f48,
)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    g_shape = (512, 512, 16)
    nq = 1_000_000
    df3 = []
    for v in (
        np.arange(g_shape[0], dtype=np.float64),
        np.arange(g_shape[1], dtype=np.float64),
        rng.normal(size=g_shape),
    ):
        df3.extend(
            jnp.asarray(np.asarray(w, np.float32)) for w in df_from_f64(v)
        )
    qx3h, qx3l = (
        jnp.asarray(np.asarray(w, np.float32))
        for w in df_from_f64(rng.uniform(0, g_shape[0] - 1, nq))
    )
    qy3h, qy3l = (
        jnp.asarray(np.asarray(w, np.float32))
        for w in df_from_f64(rng.uniform(0, g_shape[1] - 1, nq))
    )
    packed = jax.jit(pack_bilinear_rows_f48)(df3[4], df3[5])
    r = g_shape[2]

    def f48_run(a, b, c, d, pk):
        return gathered_bilinear_eval_f48_packed(
            df3[0], df3[1], df3[2], df3[3], pk, g_shape[1], r, a, b, c, d
        )

    t = device_timer(f48_run, (qx3h, qx3l, qy3h, qy3l, packed), var=0, links=2)
    print(
        f"NS3g bilinear f48 {g_shape}: {t*1e3:.2f} ms/1M  "
        f"packed table {packed.size * 4 / 1e6:.0f} MB "
        f"(DF is {packed.size * 4 / 3 * 4 / 1e6:.0f} MB)",
        flush=True,
    )


if __name__ == "__main__":
    main()
