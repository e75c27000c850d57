"""NS2d: the f48 tier on the NS2c wide-bank workload (10240 knots x
64 bank, 1M queries) — bf16-lo packed rows, 75% of the DF table's
memory and gather traffic at ~2^-33 scale-relative accuracy.

Run: timeout 580 python benches/bench_ns2d.py
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
    gathered_bank_eval_df,
    gathered_bank_eval_f48_packed,
    pack_bank_rows_f48,
)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    n, bank, nq = 10240, 64, 1_000_000
    d64 = rng.normal(size=(n, bank))
    a64 = rng.normal(size=(n - 1, bank))
    b64 = rng.normal(size=(n - 1, bank))
    x64 = np.linspace(0, 1, n)
    dfargs = []
    for v in (x64, d64, a64, b64):
        dfargs.extend(jnp.asarray(np.asarray(w, np.float32))
                      for w in df_from_f64(v))
    qh, ql = (jnp.asarray(np.asarray(w, np.float32))
              for w in df_from_f64(rng.uniform(0, 1, nq)))

    # NS2c re-measure (same session baseline)
    def df_run(qh, ql, _d):
        return gathered_bank_eval_df(*dfargs, qh, ql)

    t = device_timer(df_run, (qh, ql, dfargs[2]), var=0, links=2)
    print(f"NS2c DF bank eval: {t*1e3:.2f} ms/1M", flush=True)

    packed48 = jax.jit(pack_bank_rows_f48)(*dfargs[2:8])

    def f48_run(qh, ql, packed):
        return gathered_bank_eval_f48_packed(
            dfargs[0], dfargs[1], packed, bank, qh, ql
        )

    t48 = device_timer(f48_run, (qh, ql, packed48), var=0, links=2)
    print(
        f"NS2d f48 bank eval: {t48*1e3:.2f} ms/1M  "
        f"packed table {packed48.size * 4 / 1e6:.0f} MB "
        f"(DF is {8 * (n - 1) * 64 * 4 / 1e6:.0f} MB)",
        flush=True,
    )


if __name__ == "__main__":
    main()
