"""DF bicubic NODE-route bench: the memory-frugal f64-grade path for
grids whose DF cell table cannot fit (`config.bicubic_pack_max_elems`).

Measures, on the NS3d workload (512x512x16 grid, 1M queries):
  - the DF node route (4 DF node gathers + guarded-XLA DF tail), and
  - the DF cell route (1 packed gather + Mosaic MXU tail) for context,
plus both tables' device memory, so BASELINE.md can state the
memory/speed trade measured rather than estimated.

Run: timeout 580 python benches/bench_df_node.py
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
    gathered_bicubic_eval_df_packed,
    gathered_bicubic_nodes_eval_df,
    pack_bicubic_nodes_df,
    pack_bicubic_rows_df,
)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(11)

    nx, ny, r, nq = 512, 512, 16, 1_000_000
    x64 = np.cumsum(rng.uniform(0.5, 1.5, nx))
    y64 = np.cumsum(rng.uniform(0.5, 1.5, ny))
    qx64 = rng.uniform(x64[0], x64[-1], nq)
    qy64 = rng.uniform(y64[0], y64[-1], nq)

    # synthetic tables with the real layouts/sizes (the route's cost
    # depends on shapes only)
    cell64 = rng.normal(size=((nx - 1) * (ny - 1), 16 * r))
    node64 = rng.normal(size=(nx * ny, 4 * r + 2))
    node64[:, 4 * r + 0] = np.repeat(x64, ny)
    node64[:, 4 * r + 1] = np.tile(y64, nx)

    pairs = []
    for v in (x64, y64):
        pairs.extend(jnp.asarray(w) for w in df_from_f64(v))
    qxh, qxl = (jnp.asarray(w) for w in df_from_f64(qx64))
    qyh, qyl = (jnp.asarray(w) for w in df_from_f64(qy64))

    packed_cell = jax.jit(lambda h, l: pack_bicubic_rows_df(h, l, r))(
        *df_from_f64(cell64)
    )
    packed_node = jax.jit(pack_bicubic_nodes_df)(*df_from_f64(node64))
    print(
        f"DF cell table:  {packed_cell.shape} = "
        f"{packed_cell.size * 4 / 1e6:.0f} MB"
    )
    print(
        f"DF node table:  {packed_node.shape} = "
        f"{packed_node.size * 4 / 1e6:.0f} MB"
    )

    # tables ride as ARGUMENTS — closure capture would constant-fold the
    # 100+ MB table into the program shipped to the (remote) compiler
    def run_node(a, b, c, d, tbl):
        return gathered_bicubic_nodes_eval_df(
            *pairs, tbl, a, b, c, d, r=r
        )

    t_node = device_timer(
        run_node, (qxh, qxl, qyh, qyl, packed_node), var=0, links=2, reps=3
    )
    print(f"DF bicubic NODE route, 1M q: {t_node*1e3:.2f} ms")

    def run_node_pair(a, b, c, d, tbl):
        return gathered_bicubic_nodes_eval_df(
            *pairs, tbl, a, b, c, d, r=r, fetch="pair"
        )

    t_pair = device_timer(
        run_node_pair, (qxh, qxl, qyh, qyl, packed_node),
        var=0, links=2, reps=3,
    )
    print(
        f"DF bicubic NODE route (pair fetch), 1M q: {t_pair*1e3:.2f} ms "
        f"— ANSWERED (round 3): 5,242.8 ms vs 1,650.7 for the quad XLA "
        f"form — the vmapped 2-row dynamic_slice is ~3x WORSE than 4 "
        f"flat gathers; pair stays a tested record on the XLA branch"
    )

    def run_cell(a, b, c, d, tbl):
        return gathered_bicubic_eval_df_packed(
            *pairs, tbl, a, b, c, d, r=r
        )

    t_cell = device_timer(
        run_cell, (qxh, qxl, qyh, qyl, packed_cell), var=0, links=2, reps=3
    )
    print(
        f"DF bicubic CELL route, 1M q: {t_cell*1e3:.2f} ms "
        f"(node/cell = {t_node/t_cell:.2f}x)"
    )


if __name__ == "__main__":
    main()
