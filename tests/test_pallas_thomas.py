"""Pallas Thomas kernel — interpret-mode agreement with the scan solver."""

import numpy as np
import pytest

import jax.numpy as jnp

from ndarray_interp_tpu.ops.pallas_thomas import _thomas_pallas_impl
from ndarray_interp_tpu.ops.thomas import thomas_solve


def system(n, bank, seed=None):
    rng = np.random.default_rng(seed if seed is not None else n)
    # diagonally dominant system (like the spline systems)
    dx = rng.uniform(0.5, 2.0, n)
    a_up = jnp.asarray(np.roll(dx, 1), jnp.float32)
    a_low = jnp.asarray(dx, jnp.float32)
    a_mid = jnp.asarray(2.2 * (dx + np.roll(dx, 1)), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(n, bank)).astype(np.float32))
    return a_up, a_mid, a_low, rhs


@pytest.mark.parametrize("n,bank", [(8, 4), (33, 16), (128, 8)])
def test_kernel_matches_scan(n, bank):
    a_up, a_mid, a_low, rhs = system(n, bank)
    got = np.asarray(
        _thomas_pallas_impl(a_up, a_mid, a_low, rhs, interpret=True)
    )
    want = np.asarray(thomas_solve(a_up, a_mid, a_low, rhs))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)


def test_dispatch_falls_back_on_cpu():
    from ndarray_interp_tpu.ops.pallas_thomas import thomas_solve_fast

    a_up, a_mid, a_low, rhs = system(16, 3, seed=0)
    np.testing.assert_allclose(
        np.asarray(thomas_solve_fast(a_up, a_mid, a_low, rhs)),
        np.asarray(thomas_solve(a_up, a_mid, a_low, rhs)),
        atol=1e-6,
    )


@pytest.mark.parametrize("n,bank", [(8, 4), (64, 16)])
def test_batched_kernel_matches_scan(n, bank):
    from ndarray_interp_tpu.ops.pallas_thomas import (
        _thomas_pallas_batched_impl,
    )

    rng = np.random.default_rng(n + 1)
    dx = rng.uniform(0.5, 2.0, (n, bank))
    a_up = jnp.asarray(np.roll(dx, 1, axis=0), jnp.float32)
    a_low = jnp.asarray(dx, jnp.float32)
    a_mid = jnp.asarray(
        2.2 * (dx + np.roll(dx, 1, axis=0)), jnp.float32
    )
    rhs = jnp.asarray(rng.normal(size=(n, bank)).astype(np.float32))
    got = np.asarray(
        _thomas_pallas_batched_impl(a_up, a_mid, a_low, rhs, interpret=True)
    )
    want = np.asarray(thomas_solve(a_up, a_mid, a_low, rhs))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)
