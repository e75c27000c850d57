"""Native C++ host runtime tests.

The native path implements the reference's exact op order; agreement with
the XLA path is within a few ULP (XLA may contract into FMA where the
native build, like rustc, does not).  It must fire automatically on the
eager scalar entry points.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ndarray_interp_tpu import native
from ndarray_interp_tpu.errors import OutOfBoundsError
from ndarray_interp_tpu.interp1d import (
    Akima,
    CubicSpline,
    Interp1D,
    Linear,
)
from ndarray_interp_tpu.interp2d import Interp2D

pytestmark = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason="native runtime unavailable"
)


def test_lower_index_contract():
    # same contract as ops/searchsorted (vector_extensions.rs:55-111)
    x = np.linspace(0.0, 10.0, 11)
    assert native.lower_index(x, -1.0) == 0
    assert native.lower_index(x, 25.0) == 9
    assert native.lower_index(x, 0.0) == 0
    assert native.lower_index(x, 10.0) == 9
    assert native.lower_index(x, np.inf) == 9
    assert native.lower_index(x, -np.inf) == 0
    for i in range(100):
        assert native.lower_index(x, i / 10.0) == i // 10
    # log-spaced stresses the guess-then-bisect path
    xe = np.array([2.0**i for i in range(11)])
    for xi in range(100):
        assert native.lower_index(xe, 2.0 ** (xi / 10.0)) == xi // 10


def test_monotonic_codes():
    assert native.monotonic(np.array([1.0, 2, 3])) == 0
    assert native.monotonic(np.array([1.0, 1, 2])) == 1
    assert native.monotonic(np.array([3.0, 2, 1])) == 2
    assert native.monotonic(np.array([3.0, 3, 1])) == 3
    assert native.monotonic(np.array([1.0, 3, 2])) == 4
    assert native.monotonic(np.array([1.0])) == 4


def test_native_linear_matches_jax():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 30))
    y = rng.normal(size=(30, 4))
    itp = (
        Interp1D.builder(jnp.asarray(y))
        .x(jnp.asarray(x))
        .strategy(Linear().extrapolate(True))
        .build()
    )
    q = rng.uniform(-2, 12, 200)
    jax_out = np.asarray(itp.interp_array(q))
    nat_out, rc = native.eval_linear(x, y, q, True)
    assert rc == 0
    # XLA may contract into FMA where the native build (like rustc) does
    # not, so agreement is a few ULP rather than bitwise
    np.testing.assert_allclose(nat_out, jax_out, rtol=1e-13, atol=1e-14)


def test_native_hermite_matches_jax():
    rng = np.random.default_rng(1)
    y = rng.normal(size=16)
    itp = (
        Interp1D.builder(jnp.asarray(y))
        .strategy(CubicSpline().extrapolate(True))
        .build()
    )
    q = rng.uniform(-2, 17, 300)
    jax_out = np.asarray(itp.interp_array(q))
    nat_out, rc = native.eval_hermite(
        np.arange(16.0),
        y,
        np.asarray(itp.strategy.a),
        np.asarray(itp.strategy.b),
        q,
        1,
    )
    assert rc == 0
    np.testing.assert_allclose(nat_out, jax_out, rtol=1e-13, atol=1e-14)


def test_scalar_fast_path_fires_and_matches():
    y = jnp.array([1.5, 2.0, 3.0, 4.0, 5.0, 7.0, 7.0, 8.0, 9.0, 10.5])
    itp = Interp1D.builder(y).build()
    assert itp.interp_scalar(4.5) == 6.0
    assert itp._native_state() is not None  # cache primed, native eligible
    # OOB through the native path
    with pytest.raises(OutOfBoundsError):
        itp.interp_scalar(-0.5)


def test_scalar_fast_path_akima():
    import scipy.interpolate as si

    rng = np.random.default_rng(2)
    x = np.sort(rng.uniform(0, 10, 12))
    y = rng.normal(size=12)
    itp = (
        Interp1D.builder(jnp.asarray(y))
        .x(jnp.asarray(x))
        .strategy(Akima())
        .build()
    )
    ref = si.Akima1DInterpolator(x, y)
    for q in np.linspace(x[0], x[-1], 17):
        assert abs(float(itp.interp_scalar(q)) - float(ref(q))) < 1e-12


def test_scalar_fast_path_2d():
    data = jnp.array([[1.0, 2.0, 2.5], [3.0, 4.0, 3.5]])
    itp = Interp2D.builder(data).build()
    assert itp.interp_scalar(0.0, 0.5) == 1.5
    assert itp._native_state() is not None
    with pytest.raises(OutOfBoundsError, match="y ="):
        itp.interp_scalar(0.5, 99.0)


def test_native_periodic_wrap():
    data = jnp.array([1.0, 2.0, 2.5, 2.5, 3.0, 2.0, 1.0, -2.0, 3.0, 5.0, 6.3, 1.0])
    from ndarray_interp_tpu.interp1d.cubic_spline import BoundaryCondition

    itp = (
        Interp1D.builder(data)
        .strategy(
            CubicSpline().extrapolate(True).boundary(BoundaryCondition.Periodic)
        )
        .build()
    )
    # native scalar path wraps identically to the jax path
    for q in (-3.0, 14.5, 25.0):
        nat = float(itp.interp_scalar(q))
        jax_val = float(itp.interp(jnp.asarray(q)))
        assert abs(nat - jax_val) < 1e-12


def test_native_cubic_build_matches_jax():
    import jax.numpy as jnp2

    from ndarray_interp_tpu.models.strategies.cubic import (
        _ab_from_k,
        _solve_for_k,
    )

    rng = np.random.default_rng(3)
    for kinds in [(0, 0.0, 0, 0.0), (2, 0.0, 2, 0.0), (1, -0.1, 2, -0.5)]:
        n, bank = 14, 3
        x = np.sort(rng.uniform(0, 10, n))
        y = rng.normal(size=(n, bank))
        a, b = native.cubic_build(x, y, *kinds)
        k = _solve_for_k(
            jnp2.asarray(x), jnp2.asarray(y), kinds[0], kinds[1],
            kinds[2], kinds[3],
        )
        aj, bj = _ab_from_k(jnp2.asarray(x), jnp2.asarray(y), k)
        np.testing.assert_allclose(a, np.asarray(aj), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(b, np.asarray(bj), rtol=1e-12, atol=1e-12)


def test_scalar_fast_path_cubic_exact():
    import scipy.interpolate as si

    rng = np.random.default_rng(4)
    x = np.sort(rng.uniform(0, 10, 15))
    y = rng.normal(size=15)
    itp = (
        Interp1D.builder(y)  # numpy inputs → host copies
        .x(x)
        .strategy(CubicSpline().extrapolate(True))
        .build()
    )
    ref = si.CubicSpline(x, y, bc_type="not-a-knot")
    for q in np.linspace(x[0] - 1, x[-1] + 1, 23):
        assert abs(float(itp.interp_scalar(float(q))) - float(ref(q))) < 1e-10


def test_lower_index_nan_safe():
    # NaN queries must not hit the int-cast UB in the C entry points
    # (ADVICE r2): NaN routes to interval 0, evaluation yields NaN.
    import ctypes

    x = np.linspace(0.0, 10.0, 11)
    assert native.lower_index(x, np.nan) == 0
    lib = native._load()
    q = np.array([np.nan, 2.5, np.nan, 11.0])
    idx = np.zeros(4, np.int64)
    lib.ndi_lower_index_batch_f64(
        native._ptr(x), 11, native._ptr(q), 4,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    assert list(idx) == [0, 2, 0, 9]
    # the blocked (SIMD) eval path: NaN only reaches it with
    # extrapolate=True (OOB pre-scan catches it otherwise)
    y = np.arange(11.0)
    qs = np.full(300, np.nan)
    qs[::3] = 4.5
    out, rc = native.eval_linear(x, y, qs, True)
    assert rc == 0
    assert np.isnan(out[1]) and np.isnan(out[2])
    np.testing.assert_allclose(out[::3], 4.5)
    # extrapolate=False: NaN is an OOB abort, 1-based index of the bad query
    out, rc = native.eval_linear(x, y, np.array([1.0, np.nan]), False)
    assert rc == 2


def test_native_bicubic_matches_jax():
    """Native bicubic (node-state nested Hermite) == the jax Bicubic
    strategy, including extrapolation; OOB codes mirror bilinear's."""
    from ndarray_interp_tpu.interp2d import Bicubic
    from ndarray_interp_tpu.models.strategies.bicubic import (
        _solve_axis0,
        _solve_axis1,
        bicubic_node_grids,
    )

    rng = np.random.default_rng(17)
    nx, ny = 14, 11
    x = np.cumsum(rng.uniform(0.3, 1.0, nx))
    y = np.cumsum(rng.uniform(0.3, 1.0, ny))
    for trailing in [(), (3,)]:
        z = rng.normal(size=(nx, ny) + trailing)
        itp = (
            Interp2D.builder(jnp.asarray(z))
            .x(jnp.asarray(x))
            .y(jnp.asarray(y))
            .strategy(Bicubic().extrapolate(True))
            .build()
        )
        zj = jnp.asarray(z)
        kx, ky, kxy = (
            np.asarray(g)
            for g in bicubic_node_grids(jnp.asarray(x), jnp.asarray(y), zj)
        )
        # the public helper equals the private solves it wraps
        np.testing.assert_array_equal(
            kx, np.asarray(_solve_axis0(jnp.asarray(x), zj, "not_a_knot"))
        )
        span = x[-1] - x[0]
        qx = rng.uniform(x[0] - span / 4, x[-1] + span / 4, 200)
        qy = rng.uniform(y[0], y[-1], 200)
        out, rc = native.eval_bicubic(x, y, z, kx, ky, kxy, qx, qy, True)
        assert rc == 0
        want = np.asarray(itp.interp_array(qx, qy))
        np.testing.assert_allclose(out, want, rtol=1e-10, atol=1e-10)
    # OOB codes: positive 1-based for x, negative for y; no partial write
    z = rng.normal(size=(nx, ny))
    kx = np.asarray(
        _solve_axis0(jnp.asarray(x), jnp.asarray(z), "not_a_knot")
    )
    ky = np.asarray(
        _solve_axis1(jnp.asarray(y), jnp.asarray(z), "not_a_knot")
    )
    kxy = np.asarray(
        _solve_axis1(jnp.asarray(y), jnp.asarray(kx), "not_a_knot")
    )
    _, rc = native.eval_bicubic(
        x, y, z, kx, ky, kxy,
        np.array([x[1], x[-1] + 1.0]), np.array([y[1], y[1]]), False,
    )
    assert rc == 2
    _, rc = native.eval_bicubic(
        x, y, z, kx, ky, kxy,
        np.array([x[1], x[1]]), np.array([y[0] - 1.0, y[1]]), False,
    )
    assert rc == -1


def test_native_host_serving_example_runs():
    import importlib

    mod = importlib.import_module("examples.native_host_serving")
    mod.main()  # asserts internally (rc == 0, scalar round-trip)


def test_native_2d_query_length_mismatch_raises():
    # the C++ loops index qy by qx's length — the wrapper must refuse
    # mismatched pairs instead of reading out of bounds
    x = np.linspace(0.0, 3.0, 4)
    y = np.linspace(0.0, 2.0, 3)
    z = np.zeros((4, 3))
    with pytest.raises(ValueError, match="do not match"):
        native.eval_bilinear(x, y, z, np.zeros(5), np.zeros(2), True)
    with pytest.raises(ValueError, match="do not match"):
        native.eval_bicubic(
            x, y, z, z, z, z, np.zeros(5), np.zeros(2), True
        )
