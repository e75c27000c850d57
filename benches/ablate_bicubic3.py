"""NS3b ablation round 3: matmul-shaped tails.

Round 2 showed every elementwise tail costs ~6.5 ms on top of the
gather: XLA materializes the gathered (1M, 256) and re-streams it at
~300 GB/s for any non-trivial consumer (only a bare reduce fuses).
Matmuls, however, stream their operands at full HBM rate — so reshape
the tail INTO a matmul: corner-minor rows (trailing element major, the
16 corner quantities minor), per-query weights tiled across r (a free
broadcast), one elementwise multiply, and a (256, 16) 0/1 selection
matrix contraction.

Run: timeout 580 python benches/ablate_bicubic3.py
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
from benches.ablate_bicubic2 import _basis
from benches.run_benches import device_timer
from ndarray_interp_tpu.models.strategies.bicubic import _solve_axis1
from ndarray_interp_tpu.models.strategies.cubic import _NOT_A_KNOT, _solve_for_k
from ndarray_interp_tpu.ops.pallas_eval import fused_index_frac


def pack_cm_rows(x, y, data, kx, ky, kxy):
    """Corner-minor rows (Q-side layout (r, 16)): for each trailing
    element j, the 16 corner quantities [f11,f12,f21,f22, KX11..,
    KY11.., KXY11..] pre-scaled (K = k*dx)."""
    nx, ny = data.shape[0], data.shape[1]
    r = int(np.prod(data.shape[2:], dtype=np.int64)) if data.ndim > 2 else 1
    dx = x[1:] - x[:-1]
    dy = y[1:] - y[:-1]

    def corners(g):  # (nx-1, ny-1, 4, r)
        return jnp.stack(
            [g[:-1, :-1], g[:-1, 1:], g[1:, :-1], g[1:, 1:]], axis=2
        ).reshape(nx - 1, ny - 1, 4, r)

    sx = dx.reshape(nx - 1, 1, 1, 1)
    sy = dy.reshape(1, ny - 1, 1, 1)
    quad = jnp.concatenate(
        [
            corners(data),
            corners(kx) * sx,
            corners(ky) * sy,
            corners(kxy) * sx * sy,
        ],
        axis=2,
    )  # (nx-1, ny-1, 16, r)
    return jnp.moveaxis(quad, 2, 3).reshape((nx - 1) * (ny - 1), 16 * r)


def _weights(tx, ty):
    hx = _basis(tx)
    hy = _basis(ty)
    # minor (quantity) order matches pack_cm_rows: f[4], KX[4], KY[4],
    # KXY[4] with corners [11, 12, 21, 22] inside each
    return jnp.stack(
        [
            hx[0] * hy[0], hx[0] * hy[1], hx[1] * hy[0], hx[1] * hy[1],
            hx[2] * hy[0], hx[2] * hy[1], hx[3] * hy[0], hx[3] * hy[1],
            hx[0] * hy[2], hx[0] * hy[3], hx[1] * hy[2], hx[1] * hy[3],
            hx[2] * hy[2], hx[2] * hy[3], hx[3] * hy[2], hx[3] * hy[3],
        ],
        axis=1,
    )  # (Q, 16)


def eval_matmul(rows, x, y, ny, r, xq, yq):
    xi, tx = fused_index_frac(x, xq)
    yi, ty = fused_index_frac(y, yq)
    g = jnp.take(rows, xi * (ny - 1) + yi, axis=0)  # (Q, 16r) corner-minor
    w = _weights(tx, ty)  # (Q, 16)
    q = g.shape[0]
    wt = jnp.broadcast_to(w[:, None, :], (q, r, 16)).reshape(q, 16 * r)
    sel = jnp.zeros((16 * r, r), jnp.float32)
    sel = sel.at[jnp.arange(16 * r), jnp.arange(16 * r) // 16].set(1.0)
    return jax.lax.dot_general(
        g * wt, sel, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def eval_matmul_nosel(rows, x, y, ny, r, xq, yq):
    """Variant: multiply then reshape-reduce minor 16 (for comparison)."""
    xi, tx = fused_index_frac(x, xq)
    yi, ty = fused_index_frac(y, yq)
    g = jnp.take(rows, xi * (ny - 1) + yi, axis=0)
    w = _weights(tx, ty)
    q = g.shape[0]
    wt = jnp.broadcast_to(w[:, None, :], (q, r, 16)).reshape(q, 16 * r)
    return jnp.sum((g * wt).reshape(q, r, 16), axis=2)


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
    rows_cm = jax.jit(pack_cm_rows)(x, y, grid, kx, ky, kxy)
    rows_qm = jax.jit(pack_scaled_rows)(x, y, grid, kx, ky, kxy)

    want = jax.jit(
        lambda r_, q1, q2: eval_scaled(r_, x, y, ny, (16,), q1, q2)
    )(rows_qm, qx[:4096], qy[:4096])
    for nm, fn in [("matmul", eval_matmul), ("nosel", eval_matmul_nosel)]:
        got = jax.jit(
            lambda r_, q1, q2, f=fn: f(r_, x, y, ny, r, q1, q2)
        )(rows_cm, qx[:4096], qy[:4096])
        err = float(
            jnp.max(jnp.abs(got - want) / jnp.maximum(jnp.abs(want), 1e-2))
        )
        print(f"{nm} vs nested max rel err: {err:.2e}", flush=True)

    for name, fn in [
        ("H matmul-select tail   ", eval_matmul),
        ("I multiply+minor-reduce", eval_matmul_nosel),
    ]:
        t = device_timer(
            lambda q1, q2, r_, f=fn: f(r_, x, y, ny, r, q1, q2),
            (qx, qy, rows_cm), var=0, links=4, reps=3,
        )
        print(f"{name}: {t * 1e3:8.2f} ms /1M queries", flush=True)


if __name__ == "__main__":
    main()
