"""PCR tridiagonal solver vs the reference-order scan solver.

PCR is not bit-identical (different elimination order) but must agree to
normal rounding on the diagonally dominant systems cubic splines produce
(``a_mid = 2(dx_i + dx_{i+1})`` dominates both off-diagonals).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ndarray_interp_tpu.ops.pcr import pcr_solve
from ndarray_interp_tpu.ops.thomas import thomas_solve


def dominant_system(rng, n, batch=(), dtype=np.float64, batched_diags=False):
    dshape = (n,) + batch if batched_diags else (n,)
    lo = rng.uniform(0.5, 2.0, dshape)
    up = rng.uniform(0.5, 2.0, dshape)
    mid = lo + up + rng.uniform(0.5, 3.0, dshape)  # strictly dominant
    rhs = rng.normal(size=(n,) + batch)
    return (
        jnp.asarray(up, dtype),
        jnp.asarray(mid, dtype),
        jnp.asarray(lo, dtype),
        jnp.asarray(rhs, dtype),
    )


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 33, 100, 257, 1024])
def test_matches_scan_f64(n):
    rng = np.random.default_rng(n)
    up, mid, lo, rhs = dominant_system(rng, n, batch=(7,))
    got = np.asarray(pcr_solve(up, mid, lo, rhs))
    want = np.asarray(thomas_solve(up, mid, lo, rhs))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n", [3, 64, 500])
def test_matches_scan_f32(n):
    rng = np.random.default_rng(n + 1)
    up, mid, lo, rhs = dominant_system(rng, n, batch=(5, 3), dtype=np.float32)
    got = np.asarray(pcr_solve(up, mid, lo, rhs))
    want = np.asarray(thomas_solve(up, mid, lo, rhs))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n", [2, 16, 129])
def test_batched_diagonals(n):
    # per-lane diagonals (the Individual-boundary solve shape)
    rng = np.random.default_rng(n + 2)
    up, mid, lo, rhs = dominant_system(
        rng, n, batch=(6,), batched_diags=True
    )
    got = np.asarray(pcr_solve(up, mid, lo, rhs))
    want = np.asarray(thomas_solve(up, mid, lo, rhs))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_residual_is_tiny():
    # direct residual check, independent of the other solver
    rng = np.random.default_rng(0)
    up, mid, lo, rhs = dominant_system(rng, 333, batch=(4,))
    x = np.asarray(pcr_solve(up, mid, lo, rhs))
    up, mid, lo, rhs = (np.asarray(v) for v in (up, mid, lo, rhs))
    res = mid[:, None] * x
    res[1:] += lo[1:, None] * x[:-1]
    res[:-1] += up[:-1, None] * x[1:]
    np.testing.assert_allclose(res, rhs, rtol=1e-12, atol=1e-12)


def test_exact_small_system():
    # 3x3 solved by hand: [[2,1,0],[1,3,1],[0,1,2]] x = [3,5,3] -> x=[1,1,1]
    up = jnp.asarray([1.0, 1.0, 0.0])
    mid = jnp.asarray([2.0, 3.0, 2.0])
    lo = jnp.asarray([0.0, 1.0, 1.0])
    rhs = jnp.asarray([3.0, 5.0, 3.0])[:, None]
    x = np.asarray(pcr_solve(up, mid, lo, rhs))
    np.testing.assert_allclose(x, np.ones((3, 1)), rtol=1e-14)
