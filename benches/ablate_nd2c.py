"""ND2c round 5: stage anatomy of the 256^3 NODE-layout tricubic route
(VERDICT r4 task 10 — the capacity case, standing row 103.2 ms/1M).

Stages: per-axis (idx, t) x3 | the 8 corner node-row gathers (44 B
rows: 2^k*r + k = 11 channels) | the in-register tensor blend.
The round-4 derived model guessed "8 gathers at ~300 GB/s for
2.9 KB/query"; the corrected gather law (round 5) says narrow random
gathers are ROW-floor-bound (~13 ns/row), which predicts
8 x 13 = ~104 ns/query — the whole row.

Run: timeout 580 python benches/ablate_nd2c.py
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
from ndarray_interp_tpu.models.interpnd import InterpND, _index_frac


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(7)
    n3, k = 256, 3
    nq = 1_000_000
    axes = tuple(jnp.asarray(np.linspace(0.0, 1.0, n3), jnp.float32)
                 for _ in range(k))
    data = jax.random.normal(jax.random.PRNGKey(2), (n3,) * k, jnp.float32)
    table, layout = InterpND.build_state(axes, data, k, "cubic")
    assert layout == "node", layout
    print(f"node table {table.shape} {table.nbytes/2**20:.0f} MB", flush=True)
    qs = tuple(jnp.asarray(rng.uniform(0, 1, nq).astype(np.float32))
               for _ in range(k))

    def search(*qf):
        return tuple(_index_frac(ax, q) for ax, q in zip(axes, qf))

    t = device_timer(search, qs, var=0, links=8) * 1e3
    print(f"(idx,t) x3 axes             {t:7.3f} ms", flush=True)

    parts = jax.jit(search)(*qs)
    idx = [p[0] for p in parts]
    nstrides = [n3 * n3, n3, 1]
    base = jax.jit(
        lambda a, b, c: a * nstrides[0] + b * nstrides[1] + c
    )(*idx)

    def gather1(tb, base_):
        return jnp.take(tb, base_, axis=0)

    t = device_timer(gather1, (table, base), var=0, links=4) * 1e3
    print(f"ONE node gather (44 B rows) {t:7.3f} ms  (x8 = "
          f"{8*t:.1f})", flush=True)

    def gather8(tb, base_):
        acc = 0.0
        for off in (0, 1, n3, n3 + 1, n3 * n3, n3 * n3 + 1,
                    n3 * n3 + n3, n3 * n3 + n3 + 1):
            acc = acc + jnp.take(tb, base_ + off, axis=0)
        return acc

    t = device_timer(gather8, (table, base), var=0, links=2) * 1e3
    print(f"all 8 corner gathers        {t:7.3f} ms", flush=True)

    itp = InterpND.new_unchecked(
        axes, data, "cubic", True, table, ("not_a_knot",) * k, layout
    )
    fnd = jax.jit(lambda i, a, b, c: i.eval_unchecked(a, b, c))
    t = device_timer(fnd, (itp,) + qs, var=1, links=4) * 1e3
    print(f"full route [node]           {t:7.3f} ms (standing 103.2)",
          flush=True)

    # round-5 paired-node middle tiers: 2x memory per level for half
    # the gathers — the eval is gather-ROW-bound so ~2x per level
    for lay in ("node2", "node4"):
        tb, got_lay = InterpND.build_state(axes, data, k, "cubic",
                                           layout=lay)
        itp2 = InterpND.new_unchecked(
            axes, data, "cubic", True, tb, ("not_a_knot",) * k, lay
        )
        t = device_timer(fnd, (itp2,) + qs, var=1, links=4) * 1e3
        print(f"full route [{lay}]          {t:7.3f} ms  table "
              f"{tb.nbytes/2**20:.0f} MB", flush=True)


if __name__ == "__main__":
    main()
