"""Round-4 bench rows.

* ND2b: tricubic NODE-layout route, head-to-head on ND2's 64^3 grid
  (anatomy: 8 node-row gathers vs the cell route's 1) and at 256^3 —
  a grid whose cell table (64 ch x 16.6M cells = 4.2 GB) is past the
  pack cap, the capacity case the node layout exists for.
* ND3: the DF InterpND gather route (f64-grade tricubic on f32
  hardware), 64^3, 1M queries — the ND analogue of NS3d, giving the
  ND family its DF cost multiplier.

Run: timeout 580 python benches/bench_r4_rows.py
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
from ndarray_interp_tpu.interpnd import InterpND
from ndarray_interp_tpu.ops.df import df_from_f64
from ndarray_interp_tpu.ops.pallas_eval_df_nd import (
    gathered_nd_eval_df_packed,
    pack_rows_nd_df,
    pack_rows_nd_f48,
)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    nq = 1_000_000
    dtype = jnp.float32

    # ---- ND2b: node layout on ND2's own 64^3 grid ------------------------
    n3 = 64
    axes_nd = tuple(
        jnp.asarray(np.linspace(0.0, 1.0, n3), dtype) for _ in range(3)
    )
    data_nd = jax.random.normal(jax.random.PRNGKey(1), (n3,) * 3, dtype)
    qs_nd = tuple(
        jnp.asarray(rng.uniform(0, 1, nq).astype(np.float32))
        for _ in range(3)
    )
    fnd = jax.jit(lambda i, a, b, c: i.eval_unchecked(a, b, c))
    for layout in ("cell", "node"):
        table, lo = InterpND.build_state(
            axes_nd, data_nd, 3, "cubic", layout=layout
        )
        itp = InterpND.new_unchecked(
            axes_nd, data_nd, "cubic", True, table,
            ("not_a_knot",) * 3, lo,
        )
        mb = table.size * 4 / 1e6
        t = device_timer(fnd, (itp,) + qs_nd, links=4)
        model = InterpND.route_cost_ns(3, (n3,) * 3, 1, layout)
        print(
            f"ND2{'b' if layout == 'node' else ''} tricubic 64^3 "
            f"({layout}): {t*1e3:.2f} ms/1M  table {mb:.0f} MB  "
            f"gather-law model {model:.0f} ns/q", flush=True,
        )

    # ---- ND2b at 256^3: past the cell cap ---------------------------------
    n3 = 256
    axes_big = tuple(
        jnp.asarray(np.linspace(0.0, 1.0, n3), dtype) for _ in range(3)
    )
    data_big = jax.random.normal(jax.random.PRNGKey(2), (n3,) * 3, dtype)
    table_b, lo_b = InterpND.build_state(axes_big, data_big, 3, "cubic")
    assert lo_b == "node", lo_b
    itp_b = InterpND.new_unchecked(
        axes_big, data_big, "cubic", True, table_b,
        ("not_a_knot",) * 3, lo_b,
    )
    qs_big = tuple(
        jnp.asarray(rng.uniform(0, 1, nq).astype(np.float32))
        for _ in range(3)
    )
    t = device_timer(fnd, (itp_b,) + qs_big, links=4)
    print(
        f"ND2b tricubic 256^3 (node, forced by cap): {t*1e3:.2f} ms/1M  "
        f"table {table_b.size * 4 / 1e6:.0f} MB "
        f"(cell would be {63 * 255**3 * 4 // 2**20} MB... > cap)",
        flush=True,
    )

    # ---- ND3: DF ND gather route (f64-grade), 64^3, r=1 -------------------
    n3, r, k = 64, 1, 3
    sizes = (n3,) * 3
    ncells = (n3 - 1) ** 3
    rows64 = rng.normal(size=(ncells, (4**k) * r))
    rh, rl = (jnp.asarray(np.asarray(v, np.float32))
              for v in df_from_f64(rows64))
    packed = jax.jit(lambda h, l: pack_rows_nd_df(h, l, 4**k, r))(rh, rl)
    axes64 = [np.linspace(0.0, 1.0, n3) for _ in range(3)]
    args = []
    for a in axes64:
        args.extend(jnp.asarray(np.asarray(v, np.float32))
                    for v in df_from_f64(a))
    args.append(packed)
    qi = len(args)
    for _ in range(3):
        q64 = rng.uniform(0, 1, nq)
        args.extend(jnp.asarray(np.asarray(v, np.float32))
                    for v in df_from_f64(q64))
    route = gathered_nd_eval_df_packed(k, sizes, r, nbasis=4)

    def df_run(*a):
        hi, lo = route(*a)
        return hi + lo

    t = device_timer(df_run, tuple(args), var=qi, links=4)
    print(
        f"ND3 DF tricubic 64^3 (f64-grade): {t*1e3:.2f} ms/1M  "
        f"packed table {packed.size * 4 / 1e6:.0f} MB", flush=True,
    )

    # ---- ND3b: the f48 tier on the same workload (75% table traffic) ------
    packed48 = jax.jit(lambda h, l: pack_rows_nd_f48(h, l, 4**k, r))(rh, rl)
    args48 = list(args)
    args48[2 * k] = packed48
    route48 = gathered_nd_eval_df_packed(k, sizes, r, nbasis=4, tier="f48")

    def f48_run(*a):
        hi, lo = route48(*a)
        return hi + lo

    t = device_timer(f48_run, tuple(args48), var=qi, links=4)
    print(
        f"ND3b f48 tricubic 64^3 (~2^-33 tier): {t*1e3:.2f} ms/1M  "
        f"packed table {packed48.size * 4 / 1e6:.0f} MB", flush=True,
    )


if __name__ == "__main__":
    main()
