"""Transform semantics: dtype promotion, checkify, jit invariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ndarray_interp_tpu.interp1d import CubicSpline, Interp1D
from ndarray_interp_tpu.interp2d import Interp2D


def test_bf16_queries_promote():
    data = jnp.asarray(
        np.random.default_rng(0).normal(size=(32, 4)).astype(np.float32)
    )
    itp = (
        Interp1D.builder(data)
        .strategy(CubicSpline().extrapolate(True))
        .build()
    )
    q32 = jnp.linspace(0.0, 31.0, 64, dtype=jnp.float32)
    q16 = q32.astype(jnp.bfloat16)
    out16 = itp(q16)
    out32 = itp(q16.astype(jnp.float32))
    assert out16.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out16), np.asarray(out32))


def test_checkify_1d():
    itp = Interp1D.builder(jnp.array([1.0, 2.0, 3.0])).build()
    err, out = jax.jit(lambda t, q: t.eval_checked(q))(
        itp, jnp.array([0.5, 1.5])
    )
    err.throw()  # no error
    err, _ = jax.jit(lambda t, q: t.eval_checked(q))(
        itp, jnp.array([0.5, 99.0])
    )
    with pytest.raises(Exception, match="not in range"):
        err.throw()


def test_checkify_2d():
    itp = Interp2D.builder(jnp.ones((3, 3))).build()
    err, _ = itp.eval_checked(jnp.array([0.5]), jnp.array([9.0]))
    with pytest.raises(Exception, match="y query point"):
        err.throw()


def test_integer_queries_promote():
    itp = Interp1D.builder(jnp.array([0.0, 10.0, 20.0])).build()
    np.testing.assert_array_equal(
        np.asarray(itp(jnp.array([0, 1, 2]))), [0.0, 10.0, 20.0]
    )


def test_vmap_build_per_sample_axes():
    """vmap over spline construction with a DIFFERENT knot axis per sample
    — inexpressible in the reference (one shared x per interpolator), free
    here because build is a pure jittable function."""
    import scipy.interpolate as si

    from ndarray_interp_tpu.models.strategies.cubic import (
        CubicSplineStrategy,
    )

    rng = np.random.default_rng(0)
    B, n = 5, 12
    xs = np.sort(rng.uniform(0, 10, (B, n)), axis=1)
    ys = rng.normal(size=(B, n))
    q = jnp.linspace(2.0, 8.0, 33)

    strat = CubicSpline().extrapolate(True)

    def one(x, y):
        s = strat.build(x, y)
        itp = Interp1D.new_unchecked(x, y, s)
        return itp(q)

    batched = jax.vmap(one)(jnp.asarray(xs), jnp.asarray(ys))
    for b in range(B):
        ref = si.CubicSpline(xs[b], ys[b], bc_type="not-a-knot")(
            np.asarray(q)
        )
        np.testing.assert_allclose(np.asarray(batched[b]), ref, atol=1e-9)
