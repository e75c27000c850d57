"""Round 5, VERDICT r4 task 3: the f48 tier's TIME story, measured
head-to-head against DF on identical prepacked routes (1M queries).

The tier was sold on memory (75% of DF tables) — the question is
whether the 25% byte cut buys time.  Round-5 context: the DF search
costs ~nothing over f32 (ablate_df2d.py: 1.47 vs 1.40 ms — the
verdict's hi-only-search idea has no budget to win), the tails now
share the MXU weight-form core (the f48 lo is bf16-grade but every EFT
stage is still needed to hold ~2^-33, so the tails cost the same), so
any f48 advantage must come from the gather — and the round-5 gather
law says accesses at these row widths are LOCALITY-bound, not
byte-bound.

Run: timeout 580 python benches/ablate_f48_vs_df.py
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
    gathered_bilinear_eval_df_packed,
    gathered_bilinear_eval_f48_packed,
    pack_bilinear_rows_df,
    pack_bilinear_rows_f48,
)
from ndarray_interp_tpu.ops.pallas_eval_df_nd import (
    gathered_nd_eval_df_packed,
    pack_rows_nd_df,
    pack_rows_nd_f48,
)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(7)
    nq = 1_000_448

    # ---- bilinear pair (NS3c vs NS3g core) --------------------------------
    g_shape = (512, 512, 16)
    grid64 = rng.normal(size=g_shape)
    x64 = np.arange(g_shape[0], dtype=np.float64)
    y64 = np.arange(g_shape[1], dtype=np.float64)
    xh, xl = (jnp.asarray(v) for v in df_from_f64(x64))
    yh, yl = (jnp.asarray(v) for v in df_from_f64(y64))
    zh, zl = (jnp.asarray(v) for v in df_from_f64(grid64))
    qxh, qxl = (jnp.asarray(v) for v in df_from_f64(rng.uniform(0, 511, nq)))
    qyh, qyl = (jnp.asarray(v) for v in df_from_f64(rng.uniform(0, 511, nq)))
    ny, r = g_shape[1], g_shape[2]

    pk_df = jax.jit(pack_bilinear_rows_df)(zh, zl)
    pk_48 = jax.jit(pack_bilinear_rows_f48)(zh, zl)

    def bil_df(pk, a, b, c, d):
        return gathered_bilinear_eval_df_packed(
            xh, xl, yh, yl, pk, ny, r, a, b, c, d
        )

    def bil_48(pk, a, b, c, d):
        return gathered_bilinear_eval_f48_packed(
            xh, xl, yh, yl, pk, ny, r, a, b, c, d
        )

    for name, fn, pk in (("bilinear DF ", bil_df, pk_df),
                         ("bilinear f48", bil_48, pk_48)):
        t = device_timer(fn, (pk, qxh, qxl, qyh, qyl), var=1, links=4) * 1e3
        print(f"{name}  {t:7.3f} ms  table {pk.nbytes/2**20:.0f} MB",
              flush=True)

    # ---- ND pair (ND3 vs ND3b core) ---------------------------------------
    n3, k = 64, 3
    nb = 4 ** k
    ncells = (n3 - 1) ** 3
    rows64 = rng.normal(size=(ncells, nb))
    rh, rl = (jnp.asarray(np.asarray(v, np.float32)) for v in df_from_f64(rows64))
    nd_df = jax.jit(lambda h, l: pack_rows_nd_df(h, l, nb, 1))(rh, rl)
    nd_48 = jax.jit(lambda h, l: pack_rows_nd_f48(h, l, nb, 1))(rh, rl)
    axes_flat = []
    for _ in range(3):
        axes_flat.extend(jnp.asarray(np.asarray(v, np.float32))
                         for v in df_from_f64(np.linspace(0.0, 1.0, n3)))
    q_flat = []
    for _ in range(3):
        q_flat.extend(jnp.asarray(np.asarray(v, np.float32))
                      for v in df_from_f64(rng.uniform(0, 1, nq)))

    for name, tier, pk in (("ND DF ", "df", nd_df), ("ND f48", "f48", nd_48)):
        route = gathered_nd_eval_df_packed(k, (n3,) * 3, 1, nbasis=4,
                                           tier=tier)

        def run(pk_, *qs):
            hi, lo = route(*axes_flat, pk_, *qs)
            return hi + lo

        t = device_timer(run, (pk,) + tuple(q_flat), var=1, links=4) * 1e3
        print(f"{name}        {t:7.3f} ms  table {pk.nbytes/2**20:.0f} MB",
              flush=True)


if __name__ == "__main__":
    main()
