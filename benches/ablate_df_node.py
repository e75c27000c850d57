"""Stage ablation for the DF bicubic NODE route (1650 ms/1M measured).

Stages on the NS3d workload (512x512x16, 1M queries):
  A. the two DF (idx, t) passes alone
  B. 4 node-row gathers + a plain f32 full reduce (gather cost)
  C. full route at chunk=65536 (shipped), 262144, and unchunked-if-fits
  D. the DF tail alone on pre-gathered rows (chunked)

Run: timeout 580 python benches/ablate_df_node.py
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
    _df_index_frac_2d,
    gathered_bicubic_nodes_eval_df,
    pack_bicubic_nodes_df,
)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(11)

    nx, ny, r, nq = 512, 512, 16, 1_000_000
    x64 = np.cumsum(rng.uniform(0.5, 1.5, nx))
    y64 = np.cumsum(rng.uniform(0.5, 1.5, ny))
    qx64 = rng.uniform(x64[0], x64[-1], nq)
    qy64 = rng.uniform(y64[0], y64[-1], nq)

    node64 = rng.normal(size=(nx * ny, 4 * r + 2))
    node64[:, 4 * r + 0] = np.repeat(x64, ny)
    node64[:, 4 * r + 1] = np.tile(y64, nx)

    pairs = []
    for v in (x64, y64):
        pairs.extend(jnp.asarray(w) for w in df_from_f64(v))
    qxh, qxl = (jnp.asarray(w) for w in df_from_f64(qx64))
    qyh, qyl = (jnp.asarray(w) for w in df_from_f64(qy64))
    packed = jax.jit(pack_bicubic_nodes_df)(*df_from_f64(node64))

    # A. index pass
    def idx_pass(a, b, c, d):
        return _df_index_frac_2d(*pairs, a, b, c, d)

    t = device_timer(idx_pass, (qxh, qxl, qyh, qyl), var=0, links=2, reps=3)
    print(f"A. two DF (idx,t) passes:            {t*1e3:7.2f} ms")

    xi, txh, txl, yi, tyh, tyl = jax.jit(idx_pass)(qxh, qxl, qyh, qyl)
    xi, yi = jax.block_until_ready(xi), jax.block_until_ready(yi)

    # B. 4 gathers + full reduce (fusable — pure gather cost)
    def gathers(xi, yi, tbl):
        s = jnp.take(tbl, xi * ny + yi, axis=0).sum(axis=1)
        s += jnp.take(tbl, xi * ny + yi + 1, axis=0).sum(axis=1)
        s += jnp.take(tbl, (xi + 1) * ny + yi, axis=0).sum(axis=1)
        s += jnp.take(tbl, (xi + 1) * ny + yi + 1, axis=0).sum(axis=1)
        return s

    t = device_timer(gathers, (xi, yi, packed), var=0, links=2, reps=3)
    print(f"B. 4 node gathers + full reduce:     {t*1e3:7.2f} ms")

    # C. full route by chunk size
    for chunk in (65536, 262144):
        def run(a, b, c, d, tbl, _chunk=chunk):
            return gathered_bicubic_nodes_eval_df(
                *pairs, tbl, a, b, c, d, r=r, chunk=_chunk
            )

        t = device_timer(
            run, (qxh, qxl, qyh, qyl, packed), var=0, links=2, reps=3
        )
        print(f"C. full route, chunk={chunk:7d}:      {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
