"""NS3b ablation round 4: where do the invariant +6.5 ms go?

Every full-eval variant (nested Hermite, weight-form reduce, matmul
select) costs 16.2-16.4 ms while gather+sum costs 9.8 — isolate the
shared pieces: the (idx, t) kernel vs the bare index kernel, the weight
build, the multiply, the reduce.

Run: timeout 580 python benches/ablate_bicubic4.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from benches.ablate_bicubic2 import _basis
from benches.ablate_bicubic3 import _weights, pack_cm_rows
from benches.run_benches import device_timer
from ndarray_interp_tpu.models.strategies.bicubic import _solve_axis1
from ndarray_interp_tpu.models.strategies.cubic import _NOT_A_KNOT, _solve_for_k
from ndarray_interp_tpu.ops.pallas_eval import fused_index_frac
from ndarray_interp_tpu.ops.searchsorted import lower_index_fast


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    g_shape = (512, 512, 16)
    grid = jnp.asarray(rng.normal(size=g_shape).astype(np.float32))
    x = jnp.arange(g_shape[0], dtype=jnp.float32)
    y = jnp.arange(g_shape[1], dtype=jnp.float32)
    nq = 1_000_000
    qx = jnp.asarray(rng.uniform(0, g_shape[0] - 1, nq).astype(np.float32))
    qy = jnp.asarray(rng.uniform(0, g_shape[1] - 1, nq).astype(np.float32))
    ny, r = g_shape[1], 16

    kx = jax.jit(
        lambda d: _solve_for_k(x, d, _NOT_A_KNOT, 0.0, _NOT_A_KNOT, 0.0)
    )(grid)
    ky = jax.jit(lambda d: _solve_axis1(y, d))(grid)
    kxy = jax.jit(lambda k: _solve_axis1(y, k))(kx)
    rows = jax.jit(pack_cm_rows)(x, y, grid, kx, ky, kxy)

    def a2(qx, qy, _r):  # two (idx, t) kernels only
        xi, tx = fused_index_frac(x, qx)
        yi, ty = fused_index_frac(y, qy)
        return xi.astype(jnp.float32) + yi.astype(jnp.float32) + tx + ty

    def w2(qx, qy, _r):  # (idx, t) + weight build (no gather)
        xi, tx = fused_index_frac(x, qx)
        yi, ty = fused_index_frac(y, qy)
        w = _weights(tx, ty)
        return jnp.sum(w, axis=1) + xi.astype(jnp.float32) + yi.astype(
            jnp.float32
        )

    def e2(qx, qy, r_):  # (idx, t) + gather + sum (t unused by tail)
        xi, tx = fused_index_frac(x, qx)
        yi, ty = fused_index_frac(y, qy)
        g = jnp.take(r_, xi * (ny - 1) + yi, axis=0)
        return jnp.sum(g, axis=1) + (tx + ty)[:, None]

    def f2(qx, qy, r_):  # + per-query scalar weight (no per-channel mix)
        xi, tx = fused_index_frac(x, qx)
        yi, ty = fused_index_frac(y, qy)
        g = jnp.take(r_, xi * (ny - 1) + yi, axis=0)
        return jnp.sum(g * (tx * ty)[:, None], axis=1)

    def g2(qx, qy, r_):  # + per-channel weights via tiled broadcast
        xi, tx = fused_index_frac(x, qx)
        yi, ty = fused_index_frac(y, qy)
        g = jnp.take(r_, xi * (ny - 1) + yi, axis=0)
        w = _weights(tx, ty)
        wt = jnp.broadcast_to(w[:, None, :], (nq, r, 16)).reshape(nq, 16 * r)
        return jnp.sum(g * wt, axis=1)

    def h2(qx, qy, r_):  # per-channel weights + BLOCK sums (the real out)
        xi, tx = fused_index_frac(x, qx)
        yi, ty = fused_index_frac(y, qy)
        g = jnp.take(r_, xi * (ny - 1) + yi, axis=0)
        w = _weights(tx, ty)
        wt = jnp.broadcast_to(w[:, None, :], (nq, r, 16)).reshape(nq, 16 * r)
        return jnp.sum((g * wt).reshape(nq, r, 16), axis=2)

    def s16(qx, qy, r_):  # weighted BLOCK-SLICE sum: no wide weight array
        xi, tx = fused_index_frac(x, qx)
        yi, ty = fused_index_frac(y, qy)
        g = jnp.take(r_, xi * (ny - 1) + yi, axis=0)
        w = _weights(tx, ty)  # (Q, 16)
        acc = w[:, 0:1] * g[:, 0:r]
        for cq in range(1, 16):
            acc = acc + w[:, cq : cq + 1] * g[:, cq * r : (cq + 1) * r]
        return acc

    import os

    keys = os.environ.get("ABL4_STAGES", "a2,e2,g2").split(",")
    stages = {
        "a2": ("A2 index+frac x2        ", a2),
        "w2": ("W2 A2+weights           ", w2),
        "e2": ("E2 A2+gather+sum        ", e2),
        "f2": ("F2 E2+scalar weight     ", f2),
        "g2": ("G2 E2+channel weights   ", g2),
        "h2": ("H2 G2+block sums (full) ", h2),
        "s16": ("S16 16 scalar-wt slices ", s16),
    }
    for name, fn in [stages[k] for k in keys]:
        t = device_timer(fn, (qx, qy, rows), var=0, links=4, reps=3)
        print(f"{name}: {t * 1e3:8.2f} ms /1M queries", flush=True)


if __name__ == "__main__":
    main()
