"""Pallas batched tridiagonal (Thomas) solver.

The scan-based solver (:mod:`.thomas`) is correct everywhere but pays XLA
per-step overhead on TPU (~12 ms for a 2048-knot × 4096-spline bank even
unrolled).  This kernel runs the same recurrence as a hardware loop with
the bank tiled across lanes: shared diagonals live in SMEM as 1-D scalar
arrays, each step updates one (1, B) row of the right-hand side, and the
back-substitution reuses the swept diagonal from SMEM scratch.  Per-element
operation order matches the scan solver (and therefore the reference's
``thomas``, ``cubic_spline.rs:678-721``).

Scope: shared 1-D diagonals (the uniform-boundary case — ``Individual``
boundary banks have batched diagonals and stay on the scan path), f32,
bank tiled in lanes.  Gradients: ``custom_vjp`` whose backward pass is the
VJP of the scan solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .thomas import thomas_solve

# bank lanes per grid step, by knot count: the VMEM budget is dominated by
# the double-buffered (n, tile) rhs/k blocks (~4 * n * tile * 4 bytes)
def _pick_tile(n: int):
    if n <= 1024:
        return 512
    if n <= 2048:
        return 256
    if n <= 4096:
        return 128
    return None  # fall back to the scan solver


def _pick_tile_batched(n: int):
    # batched diagonals put 5 (n, tile) blocks in VMEM instead of 2
    if n <= 1024:
        return 256
    if n <= 4096:
        return 128
    return None


def _kernel_batched(
    a_up_ref, a_mid_ref, a_low_ref, rhs_ref, k_ref, amid_scratch
):
    """Per-lane (batched) diagonals: every operand is an (n, B) block and
    each system in the bank has its own tridiagonal matrix — the
    ``Individual``-boundary case, where boundary rows differ per spline."""
    n = rhs_ref.shape[0]

    amid0 = a_mid_ref[0:1, :]  # (1, B)
    amid_scratch[0:1, :] = amid0
    k_ref[0:1, :] = rhs_ref[0:1, :]

    def fwd(i, carry):
        amid_prev, rhs_prev = carry
        w = a_low_ref[pl.ds(i, 1), :] / amid_prev  # (1, B)
        amid_new = (
            a_mid_ref[pl.ds(i, 1), :] - w * a_up_ref[pl.ds(i - 1, 1), :]
        )
        rhs_new = rhs_ref[pl.ds(i, 1), :] - w * rhs_prev
        amid_scratch[pl.ds(i, 1), :] = amid_new
        k_ref[pl.ds(i, 1), :] = rhs_new
        return amid_new, rhs_new

    amid_last, rhs_last = jax.lax.fori_loop(
        1, n, fwd, (amid0, rhs_ref[0:1, :])
    )

    k_last = rhs_last / amid_last
    k_ref[pl.ds(n - 1, 1), :] = k_last

    def bwd(j, k_next):
        i = n - 2 - j
        k_i = (
            k_ref[pl.ds(i, 1), :] - a_up_ref[pl.ds(i, 1), :] * k_next
        ) / amid_scratch[pl.ds(i, 1), :]
        k_ref[pl.ds(i, 1), :] = k_i
        return k_i

    jax.lax.fori_loop(0, n - 1, bwd, k_last)


def _thomas_pallas_batched_impl(a_up, a_mid, a_low, rhs, interpret=False):
    """All operands (n, bank) with per-lane diagonals."""
    n, bank = rhs.shape
    tile = _pick_tile_batched(n) if not interpret else bank
    nb = -(-bank // tile)
    pad = nb * tile - bank

    def p(v):
        return jnp.pad(v, ((0, 0), (0, pad)), constant_values=1.0)

    blk = lambda: pl.BlockSpec(
        (n, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel_batched,
        grid=(nb,),
        in_specs=[blk(), blk(), blk(), blk()],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((n, nb * tile), rhs.dtype),
        scratch_shapes=[pltpu.VMEM((n, tile), rhs.dtype)],
        interpret=interpret,
    )(p(a_up), p(a_mid), p(a_low), jnp.pad(rhs, ((0, 0), (0, pad))))
    return out[:, :bank]


@jax.custom_vjp
def _thomas_pallas_batched(a_up, a_mid, a_low, rhs):
    return _thomas_pallas_batched_impl(a_up, a_mid, a_low, rhs)


def _fwd_b(a_up, a_mid, a_low, rhs):
    return _thomas_pallas_batched_impl(a_up, a_mid, a_low, rhs), (
        a_up,
        a_mid,
        a_low,
        rhs,
    )


def _bwd_b(res, g):
    _, vjp = jax.vjp(thomas_solve, *res)
    return vjp(g)


_thomas_pallas_batched.defvjp(_fwd_b, _bwd_b)


def _kernel(a_up_ref, a_mid_ref, a_low_ref, rhs_ref, k_ref, amid_scratch):
    # The diagonals and the swept diagonal live in SMEM as 1-D scalar
    # arrays (scalar memory supports dynamic scalar reads/writes; VMEM has
    # neither scalar stores nor dynamic lane slicing).  Row updates are
    # (1, B) vector ops scaled by the SMEM scalars.
    n = rhs_ref.shape[0]

    # forward sweep: rhs' into k_ref, swept diagonal into scratch
    amid0 = a_mid_ref[0]
    amid_scratch[0] = amid0
    k_ref[0:1, :] = rhs_ref[0:1, :]

    def fwd(i, carry):
        amid_prev, rhs_prev = carry
        w = a_low_ref[i] / amid_prev  # scalar
        amid_new = a_mid_ref[i] - w * a_up_ref[i - 1]
        rhs_new = rhs_ref[pl.ds(i, 1), :] - w * rhs_prev
        amid_scratch[i] = amid_new
        k_ref[pl.ds(i, 1), :] = rhs_new
        return amid_new, rhs_new

    amid_last, rhs_last = jax.lax.fori_loop(
        1, n, fwd, (amid0, rhs_ref[0:1, :])
    )

    # back substitution in place over k_ref
    k_last = rhs_last / amid_last
    k_ref[pl.ds(n - 1, 1), :] = k_last

    def bwd(j, k_next):
        i = n - 2 - j
        k_i = (
            k_ref[pl.ds(i, 1), :] - a_up_ref[i] * k_next
        ) / amid_scratch[i]
        k_ref[pl.ds(i, 1), :] = k_i
        return k_i

    jax.lax.fori_loop(0, n - 1, bwd, k_last)


def _thomas_pallas_impl(a_up, a_mid, a_low, rhs, interpret=False):
    n, bank = rhs.shape
    tile = _pick_tile(n) if not interpret else bank
    nb = -(-bank // tile)
    pad = nb * tile - bank
    rhs_p = jnp.pad(rhs, ((0, 0), (0, pad)))

    out = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, nb * tile), rhs.dtype),
        scratch_shapes=[pltpu.SMEM((n,), rhs.dtype)],
        interpret=interpret,
    )(a_up, a_mid, a_low, rhs_p)
    return out[:, :bank]


@jax.custom_vjp
def _thomas_pallas(a_up, a_mid, a_low, rhs):
    return _thomas_pallas_impl(a_up, a_mid, a_low, rhs)


def _fwd(a_up, a_mid, a_low, rhs):
    return _thomas_pallas_impl(a_up, a_mid, a_low, rhs), (
        a_up,
        a_mid,
        a_low,
        rhs,
    )


def _bwd(res, g):
    _, vjp = jax.vjp(thomas_solve, *res)
    return vjp(g)


_thomas_pallas.defvjp(_fwd, _bwd)


def can_use_pallas_thomas(a_up, a_mid, a_low, rhs) -> bool:
    """Shape/dtype eligibility; the platform is decided at lowering time."""
    n = rhs.shape[0]
    return (
        rhs.dtype == jnp.float32
        and a_up.ndim == a_mid.ndim == a_low.ndim == 1
        and n >= 8
        and _pick_tile(n) is not None
    )


def _can_use_batched(a_up, a_mid, a_low, rhs) -> bool:
    return (
        rhs.dtype == jnp.float32
        and a_up.shape == a_mid.shape == a_low.shape == rhs.shape
        and rhs.ndim >= 2
        and rhs.shape[0] >= 8
        and _pick_tile_batched(rhs.shape[0]) is not None
    )


def thomas_solve_fast(a_up, a_mid, a_low, rhs):
    """Dispatch: PCR on TPU, reference-order scan solver otherwise.

    Platform selection happens per lowering via ``lax.platform_dependent``,
    so a program sharded onto CPU devices (e.g. a virtual mesh) never
    touches the TPU path even when a TPU is the default backend.

    On TPU the sequential Thomas recurrence is latency-bound (~2n
    dependent steps) however it is kerneled; parallel cyclic reduction
    (:mod:`..ops.pcr`) trades O(log n) full-width vector passes for the
    chain and measured 1.6-1.7x faster than the in-VMEM serial Pallas
    kernels across spline-bank shapes on v5e ((2048, 4096): 2.1 ms vs
    3.5 ms), at normal f32 rounding differences (~3e-7 scaled) from the
    reference elimination order.  The scan path stays the default so CPU
    f64 results remain bit-identical to the reference
    (``cubic_spline.rs:678-721``).  The serial Pallas kernels above are
    kept for exact-order TPU solves via ``_thomas_pallas`` directly.
    """
    from .. import config
    from .pcr import pcr_solve

    if getattr(config, "use_fused_kernel", True):
        return jax.lax.platform_dependent(
            a_up, a_mid, a_low, rhs, tpu=pcr_solve, default=thomas_solve
        )

    return thomas_solve(a_up, a_mid, a_low, rhs)
