"""Stage ablation for NS3b (bicubic 512x512x16, 1M queries) — VERDICT r2
task 1.  Measures each stage of the bicubic eval on the real chip and a
candidate pre-scaled row formulation:

stages:
  A  two fused bucketizes (xi, yi)
  B  A + cell index + packed-row gather (sum rows, no tail)   [260 ch rows]
  C  full current eval (Bicubic.eval)
  D  pre-scaled pack (16r channels, no endpoints; tx/ty from
     fused_index_frac) + Hermite tail
  E  D's gather alone (256 ch rows)

Run: timeout 580 python benches/ablate_bicubic.py
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
from ndarray_interp_tpu.models.interp2d import Interp2D
from ndarray_interp_tpu.models.strategies.bicubic import (
    Bicubic,
    pack_bicubic_rows,
    _hermite,
    _solve_axis1,
)
from ndarray_interp_tpu.models.strategies.cubic import _NOT_A_KNOT, _solve_for_k
from ndarray_interp_tpu.ops.pallas_eval import fused_index_frac
from ndarray_interp_tpu.ops.searchsorted import lower_index_fast


def _hermite_scaled(y_l, y_r, K_l, K_r, t):
    """Hermite with pre-scaled derivatives K = k*dx: a = K_l - dy."""
    dy = y_r - y_l
    a = K_l - dy
    b = dy - K_r
    one = jnp.ones((), t.dtype)
    return (one - t) * y_l + t * y_r + t * (one - t) * (a * (one - t) + b * t)


def pack_scaled_rows(x, y, data, kx, ky, kxy):
    """(nx-1)(ny-1) x 16r rows: (f, kx*dx, ky*dy, kxy*dx*dy) x 4 corners."""
    nx, ny = data.shape[0], data.shape[1]
    r = int(np.prod(data.shape[2:], dtype=np.int64)) if data.ndim > 2 else 1
    dx = (x[1:] - x[:-1]).reshape(nx - 1, *([1] * (data.ndim - 1)))
    dy = (y[1:] - y[:-1]).reshape(1, ny - 1, *([1] * (data.ndim - 2)))

    def corners(g):
        return jnp.stack(
            [g[:-1, :-1], g[:-1, 1:], g[1:, :-1], g[1:, 1:]], axis=2
        ).reshape(nx - 1, ny - 1, 4 * r)

    blocks = [
        corners(data),
        corners(kx) * dx.reshape(nx - 1, 1, 1),
        corners(ky) * dy.reshape(1, ny - 1, 1),
        corners(kxy) * dx.reshape(nx - 1, 1, 1) * dy.reshape(1, ny - 1, 1),
    ]
    return jnp.concatenate(blocks, axis=-1).reshape(
        (nx - 1) * (ny - 1), 16 * r
    )


def eval_scaled(rows, x, y, ny, trailing, xq, yq):
    r = int(np.prod(trailing, dtype=np.int64)) if trailing else 1
    xi, tx = fused_index_frac(x, xq)
    yi, ty = fused_index_frac(y, yq)
    g = jnp.take(rows, xi * (ny - 1) + yi, axis=0)
    out_shape = xq.shape + trailing
    expand = xq.shape + (1,) * len(trailing)
    tx = tx.reshape(expand)
    ty = ty.reshape(expand)

    def block(i):
        base = 4 * r * i
        return tuple(
            g[:, base + j * r : base + (j + 1) * r].reshape(out_shape)
            for j in range(4)
        )

    f11, f12, f21, f22 = block(0)
    kx11, kx12, kx21, kx22 = block(1)
    ky11, ky12, ky21, ky22 = block(2)
    kxy11, kxy12, kxy21, kxy22 = block(3)
    f_y1 = _hermite_scaled(f11, f21, kx11, kx21, tx)
    f_y2 = _hermite_scaled(f12, f22, kx12, kx22, tx)
    g_y1 = _hermite_scaled(ky11, ky21, kxy11, kxy21, tx)
    g_y2 = _hermite_scaled(ky12, ky22, kxy12, kxy22, tx)
    return _hermite_scaled(f_y1, f_y2, g_y1, g_y2, ty)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(7)
    g_shape = (512, 512, 16)
    grid = jnp.asarray(rng.normal(size=g_shape).astype(np.float32))
    x = jnp.arange(g_shape[0], dtype=jnp.float32)
    y = jnp.arange(g_shape[1], dtype=jnp.float32)
    nq = 1_000_000
    qx = jnp.asarray(rng.uniform(0, g_shape[0] - 1, nq).astype(np.float32))
    qy = jnp.asarray(rng.uniform(0, g_shape[1] - 1, nq).astype(np.float32))

    build = jax.jit(
        lambda x_, y_, d_: Bicubic(extrapolate=True).build(x_, y_, d_)
    )
    strat = build(x, y, grid)
    itp = Interp2D.new_unchecked(x, y, grid, strat)
    ny = g_shape[1]
    trailing = g_shape[2:]

    kx = jax.jit(
        lambda d: _solve_for_k(x, d, _NOT_A_KNOT, 0.0, _NOT_A_KNOT, 0.0)
    )(grid)
    ky = jax.jit(lambda d: _solve_axis1(y, d))(grid)
    kxy = jax.jit(lambda k: _solve_axis1(y, k))(kx)
    rows_scaled = jax.jit(pack_scaled_rows)(x, y, grid, kx, ky, kxy)
    print(
        "rows: current", strat.rows.shape,
        f"{strat.rows.size * 4 / 1e6:.0f} MB; scaled", rows_scaled.shape,
        f"{rows_scaled.size * 4 / 1e6:.0f} MB",
    )

    # correctness of the scaled form vs the shipped eval (pass the big
    # tables as ARGUMENTS: closure constants ship with the remote-compile
    # request body and blow its length limit)
    got = jax.jit(
        lambda r_, q1, q2: eval_scaled(r_, x, y, ny, trailing, q1, q2)
    )(rows_scaled, qx[:4096], qy[:4096])
    want = jax.jit(lambda i_, q1, q2: i_.strategy.eval(i_, q1, q2))(
        itp, qx[:4096], qy[:4096]
    )
    err = float(
        jnp.max(jnp.abs(got - want) / jnp.maximum(jnp.abs(want), 1e-3))
    )
    print(f"scaled-vs-current max rel err: {err:.2e}")

    def stage_a(qx, qy, _r):
        return (
            lower_index_fast(x, qx).astype(jnp.float32)
            + lower_index_fast(y, qy).astype(jnp.float32)
        )

    def stage_b(qx, qy, r_):
        xi = lower_index_fast(x, qx)
        yi = lower_index_fast(y, qy)
        g = jnp.take(r_, xi * (ny - 1) + yi, axis=0)
        return jnp.sum(g, axis=1)

    def stage_c(qx, qy, i_):
        return i_.strategy.eval(i_, qx, qy)

    def stage_d(qx, qy, r_):
        return eval_scaled(r_, x, y, ny, trailing, qx, qy)

    for name, fn, extra in [
        ("A bucketize x2         ", stage_a, x),
        ("B A+gather260 (sum)    ", stage_b, strat.rows),
        ("C full current eval    ", stage_c, itp),
        ("D scaled eval (16r)    ", stage_d, rows_scaled),
        ("E A+gather256 (sum)    ", stage_b, rows_scaled),
    ]:
        t = device_timer(fn, (qx, qy, extra), var=0, links=4, reps=3)
        print(f"{name}: {t * 1e3:8.2f} ms /1M queries", flush=True)


if __name__ == "__main__":
    main()
