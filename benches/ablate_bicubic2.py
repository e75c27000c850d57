"""NS3b ablation round 2: weight-form tails on the 16r-channel rows.

The round-1 ablation showed gather+full-reduce costs 9.8 ms while the
nested-Hermite tail costs +6.4 ms over the bare gather — the tail is
re-streaming the gathered GB instead of fusing.  The bicubic value is a
per-query linear functional of the 16 corner quantities:

    out[q, r] = sum_c w[q, c] * G[q, c, r]

with w the 16 products of cubic Hermite basis functions in tx/ty — i.e.
exactly a broadcast-multiply + 16-way reduce, the shape XLA fused for
free in the sum stage.

Run: timeout 580 python benches/ablate_bicubic2.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from benches.ablate_bicubic import eval_scaled, pack_scaled_rows
from benches.run_benches import device_timer
from ndarray_interp_tpu.models.strategies.bicubic import _solve_axis1
from ndarray_interp_tpu.models.strategies.cubic import _NOT_A_KNOT, _solve_for_k
from ndarray_interp_tpu.ops.pallas_eval import fused_index_frac


def _basis(t):
    """Cubic Hermite basis (pre-scaled derivative form): value weights
    (h00, h01) and K-weights (h10, h11) with K = k*dx."""
    t2 = t * t
    t3 = t2 * t
    h00 = 2.0 * t3 - 3.0 * t2 + 1.0
    h01 = -2.0 * t3 + 3.0 * t2
    h10 = t3 - 2.0 * t2 + t
    h11 = t3 - t2
    return h00, h01, h10, h11


def eval_weightform(rows, x, y, ny, r, xq, yq):
    """out[q, :] = sum_c w[q, c] * G[q, c, :] (single reduce pass)."""
    xi, tx = fused_index_frac(x, xq)
    yi, ty = fused_index_frac(y, yq)
    g = jnp.take(rows, xi * (ny - 1) + yi, axis=0)  # (Q, 16r)
    hx = _basis(tx)  # each (Q,)
    hy = _basis(ty)
    # corner order inside each quantity block: [11, 12, 21, 22]
    # quantity order: f (hx0*hy0), KX (hx1*hy0), KY (hx0*hy1), KXY (hx1*hy1)
    w = jnp.stack(
        [
            hx[0] * hy[0], hx[0] * hy[1], hx[1] * hy[0], hx[1] * hy[1],
            hx[2] * hy[0], hx[2] * hy[1], hx[3] * hy[0], hx[3] * hy[1],
            hx[0] * hy[2], hx[0] * hy[3], hx[1] * hy[2], hx[1] * hy[3],
            hx[2] * hy[2], hx[2] * hy[3], hx[3] * hy[2], hx[3] * hy[3],
        ],
        axis=1,
    )  # (Q, 16)
    g3 = g.reshape(g.shape[0], 16, r)
    return jnp.sum(w[:, :, None] * g3, axis=1)


def eval_weightform_dot(rows, x, y, ny, r, xq, yq):
    """Same, via batched dot_general (MXU candidate)."""
    xi, tx = fused_index_frac(x, xq)
    yi, ty = fused_index_frac(y, yq)
    g = jnp.take(rows, xi * (ny - 1) + yi, axis=0)
    hx = _basis(tx)
    hy = _basis(ty)
    w = jnp.stack(
        [
            hx[0] * hy[0], hx[0] * hy[1], hx[1] * hy[0], hx[1] * hy[1],
            hx[2] * hy[0], hx[2] * hy[1], hx[3] * hy[0], hx[3] * hy[1],
            hx[0] * hy[2], hx[0] * hy[3], hx[1] * hy[2], hx[1] * hy[3],
            hx[2] * hy[2], hx[2] * hy[3], hx[3] * hy[2], hx[3] * hy[3],
        ],
        axis=1,
    )
    g3 = g.reshape(g.shape[0], 16, r)
    return jax.lax.dot_general(
        w, g3, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


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
    rows = jax.jit(pack_scaled_rows)(x, y, grid, kx, ky, kxy)

    # correctness vs the scaled nested-Hermite form
    want = jax.jit(
        lambda r_, q1, q2: eval_scaled(r_, x, y, ny, (16,), q1, q2)
    )(rows, qx[:4096], qy[:4096])
    for nm, fn in [("weightform", eval_weightform), ("dot", eval_weightform_dot)]:
        got = jax.jit(
            lambda r_, q1, q2, f=fn: f(r_, x, y, ny, r, q1, q2)
        )(rows, qx[:4096], qy[:4096])
        err = float(
            jnp.max(jnp.abs(got - want) / jnp.maximum(jnp.abs(want), 1e-2))
        )
        print(f"{nm} vs nested max rel err: {err:.2e}")

    for name, fn in [
        ("F weight-form reduce   ", eval_weightform),
        ("G weight-form dot      ", eval_weightform_dot),
    ]:
        t = device_timer(
            lambda q1, q2, r_, f=fn: f(r_, x, y, ny, r, q1, q2),
            (qx, qy, rows), var=0, links=4, reps=3,
        )
        print(f"{name}: {t * 1e3:8.2f} ms /1M queries", flush=True)


if __name__ == "__main__":
    main()
