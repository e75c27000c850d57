"""Ports of the reference 1-D integration tests.

Reference: ``/root/reference/tests/interp1d.rs`` plus the inline
dimension-sweep tests in ``src/interp1d/mod.rs:479-607`` and the crate-root
doctests (``src/lib.rs:37-72``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ndarray_interp_tpu.errors import (
    BuilderError,
    InterpolateError,
    MonotonicError,
    NotEnoughDataError,
    OutOfBoundsError,
    ShapeError,
)
from ndarray_interp_tpu.interp1d import Interp1D, Interp1DBuilder, Linear


def test_crate_doctest_1d():
    # src/lib.rs:37-48
    data = jnp.array([0.0, 1.0, 1.5, 1.0, 0.0])
    interp = Interp1DBuilder(data).build()
    assert interp.interp_scalar(3.5) == 0.5
    result = interp.interp_array(jnp.array([0.0, 0.5, 1.5]))
    np.testing.assert_array_equal(result, [0.0, 0.5, 1.25])


def test_crate_doctest_multidim():
    # src/lib.rs:50-72
    data = jnp.array([[0.0, 1.0], [1.0, 2.0], [1.5, 2.5], [1.0, 2.0]])
    x = jnp.array([1.0, 2.0, 3.0, 4.0])
    interp = (
        Interp1D.builder(data)
        .strategy(Linear().extrapolate(True))
        .x(x)
        .build()
    )
    np.testing.assert_array_equal(interp.interp(0.5), [-0.5, 0.5])
    np.testing.assert_array_equal(
        interp.interp_array(jnp.array([0.5, 4.0])),
        [[-0.5, 0.5], [1.0, 2.0]],
    )


def test_interp_y_only():
    # tests/interp1d.rs:20-30
    interp = Interp1D.builder(
        jnp.array([1.5, 2.0, 3.0, 4.0, 5.0, 7.0, 7.0, 8.0, 9.0, 10.5])
    ).build()
    assert interp.interp_scalar(0.0) == 1.5
    assert interp.interp_scalar(9.0) == 10.5
    assert interp.interp_scalar(4.5) == 6.0
    assert interp.interp_scalar(0.25) == 1.625
    assert interp.interp_scalar(8.75) == 10.125


def test_extrapolate_y_only():
    # tests/interp1d.rs:32-40
    interp = (
        Interp1D.builder(jnp.array([1.0, 2.0, 1.5]))
        .strategy(Linear().extrapolate(True))
        .build()
    )
    assert interp.interp_scalar(-1.0) == 0.0
    assert interp.interp_scalar(3.0) == 1.0


def test_interp_with_x_and_y():
    # tests/interp1d.rs:42-54
    interp = (
        Interp1DBuilder(
            jnp.array([1.5, 2.0, 3.0, 4.0, 5.0, 7.0, 7.0, 8.0, 9.0, 10.5])
        )
        .x(jnp.array([-4.0, -3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0]))
        .strategy(Linear())
        .build()
    )
    assert interp.interp_scalar(-4.0) == 1.5
    assert interp.interp_scalar(5.0) == 10.5
    assert interp.interp_scalar(0.5) == 6.0
    assert interp.interp_scalar(-3.75) == 1.625
    assert interp.interp_scalar(4.75) == 10.125


def test_interp_with_x_and_y_expspaced():
    # tests/interp1d.rs:56-69
    interp = (
        Interp1DBuilder(
            jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 4.0, 3.0, 2.0, 1.0])
        )
        .x(jnp.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0, 256.0, 512.0]))
        .strategy(Linear())
        .build()
    )
    assert interp.interp_scalar(1.0) == 1.0
    assert interp.interp_scalar(512.0) == 1.0
    assert interp.interp_scalar(42.0) == 4.6875
    assert interp.interp_scalar(365.0) == 1.57421875


def test_extrapolate_with_x_and_y():
    # tests/interp1d.rs:71-80
    interp = (
        Interp1DBuilder(jnp.array([1.0, 0.0, 1.5]))
        .x(jnp.array([0.0, 1.0, 1.5]))
        .strategy(Linear().extrapolate(True))
        .build()
    )
    assert interp.interp_scalar(-1.0) == 2.0
    assert interp.interp_scalar(2.0) == 3.0


def test_interp_array():
    # tests/interp1d.rs:82-90
    interp = Interp1D.builder(
        jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 4.0, 3.0, 2.0, 1.0])
    ).build()
    x_query = jnp.array([[1.0, 2.0, 9.0], [4.0, 5.0, 7.5]])
    y_expect = np.array([[2.0, 3.0, 1.0], [5.0, 5.0, 2.5]])
    np.testing.assert_array_equal(interp.interp_array(x_query), y_expect)


def test_interp_y_only_out_of_bounds():
    # tests/interp1d.rs:92-103
    interp = Interp1D.builder(jnp.array([1.0, 2.0, 3.0])).build()
    with pytest.raises(OutOfBoundsError):
        interp.interp(-0.1)
    with pytest.raises(OutOfBoundsError):
        interp.interp(9.0)
    # OutOfBoundsError is an InterpolateError (matches! idiom)
    assert issubclass(OutOfBoundsError, InterpolateError)


def test_interp_with_x_and_y_out_of_bounds():
    # tests/interp1d.rs:105-120
    interp = (
        Interp1DBuilder(jnp.array([1.0, 2.0, 3.0]))
        .x(jnp.array([-4.0, -3.0, 2.0]))
        .strategy(Linear())
        .build()
    )
    with pytest.raises(OutOfBoundsError):
        interp.interp(-4.1)
    with pytest.raises(OutOfBoundsError):
        interp.interp(2.1)


def test_interp_builder_errors():
    # tests/interp1d.rs:122-140
    with pytest.raises(NotEnoughDataError):
        Interp1DBuilder(jnp.array([1])).build()
    with pytest.raises(ShapeError):
        Interp1DBuilder(jnp.array([1, 2])).x(jnp.array([1, 2, 3])).build()
    with pytest.raises(MonotonicError):
        Interp1DBuilder(jnp.array([1, 2, 3])).x(jnp.array([1, 2, 2])).build()
    # all variants are BuilderError subclasses
    for err in (NotEnoughDataError, ShapeError, MonotonicError):
        assert issubclass(err, BuilderError)


def test_interp_view_array():
    # tests/interp1d.rs:142-155 — reversed view as data
    a = np.arange(1.0, 11.0)[::-1]
    interp = (
        Interp1D.builder(jnp.asarray(a.copy()))
        .x(jnp.array([-4.0, -3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0]))
        .build()
    )
    assert interp.interp_scalar(-4.0) == 10.0
    assert interp.interp_scalar(5.0) == 1.0
    assert interp.interp_scalar(0.0) == 6.0
    assert interp.interp_scalar(-3.5) == 9.5
    assert interp.interp_scalar(4.75) == 1.25


def test_interp_array_with_different_repr():
    # tests/interp1d.rs:197-205 — queries passed as a view; the Python
    # analogues are non-contiguous numpy views and plain nested lists
    interp = Interp1D.builder(
        jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 4.0, 3.0, 2.0, 1.0])
    ).build()
    q = np.array([[1.0, 2.0, 9.0], [4.0, 5.0, 7.5]])
    want = np.array([[2.0, 3.0, 1.0], [5.0, 5.0, 2.5]])
    np.testing.assert_array_equal(np.asarray(interp.interp_array(q)), want)
    # strided (non-contiguous) view of a wider buffer
    wide = np.zeros((2, 6))
    wide[:, ::2] = q
    np.testing.assert_array_equal(
        np.asarray(interp.interp_array(wide[:, ::2])), want
    )
    # plain nested lists
    np.testing.assert_array_equal(
        np.asarray(interp.interp_array([[1.0, 2.0, 9.0], [4.0, 5.0, 7.5]])),
        want,
    )


def test_interp_multi_fn():
    # tests/interp1d.rs:157-195
    data = jnp.array(
        [
            [0.1, 0.2, 0.3, 0.4, 0.5],
            [2.0, 2.0, 3.0, 4.0, 5.0],
            [10.0, 20.0, 30.0, 40.0, 50.0],
            [20.0, 40.0, 60.0, 80.0, 100.0],
        ]
    )
    interp = Interp1DBuilder(data).x(jnp.array([1.0, 2.0, 3.0, 4.0])).build()
    np.testing.assert_allclose(
        interp.interp(1.5), [1.05, 1.1, 1.65, 2.2, 2.75], atol=1e-15
    )
    result = interp.interp_array(jnp.array([[1.0, 1.5], [3.5, 4.0]]))
    np.testing.assert_allclose(
        result[1, 1], [20.0, 40.0, 60.0, 80.0, 100.0], atol=1e-15
    )
    expect = np.array(
        [
            [[0.1, 0.2, 0.3, 0.4, 0.5], [1.05, 1.1, 1.65, 2.2, 2.75]],
            [
                [15.0, 30.0, 45.0, 60.0, 75.0],
                [20.0, 40.0, 60.0, 80.0, 100.0],
            ],
        ]
    )
    np.testing.assert_allclose(result, expect, atol=1e-15)


def test_interp_array_with_different_repr():
    # tests/interp1d.rs:197-205 — numpy input instead of jax array
    interp = Interp1D.builder(
        jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 4.0, 3.0, 2.0, 1.0])
    ).build()
    x_query = np.array([[1.0, 2.0, 9.0], [4.0, 5.0, 7.5]])
    y_expect = np.array([[2.0, 3.0, 1.0], [5.0, 5.0, 2.5]])
    np.testing.assert_array_equal(interp.interp_array(x_query), y_expect)


# --- dimension sweep (src/interp1d/mod.rs:499-537) -------------------------
def rand_arr(shape, seed=64):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.0, 1.0, size=shape))


@pytest.mark.parametrize("ndim", [1, 2, 3, 4, 5, 6, 7])
def test_dim_sweep(ndim):
    shape = (4,) * ndim
    interp = Interp1D.builder(rand_arr(shape)).build()

    res = interp.interp(2.2)
    assert res.ndim == ndim - 1

    buf = np.zeros(res.shape)
    interp.interp_into(2.2, buf)
    np.testing.assert_allclose(buf, res, atol=2.3e-16)

    query = jnp.array([[0.5, 1.0], [1.5, 2.0]])
    res = interp.interp_array(query)
    assert res.ndim == ndim - 1 + query.ndim

    buf = np.zeros(res.shape)
    interp.interp_array_into(query, buf)
    np.testing.assert_allclose(buf, res, atol=2.3e-16)


def test_interp1d_1d_scalar_type():
    # mod.rs:539-547 — scalar return is a plain float-like 0-d value
    interp = Interp1D.builder(rand_arr((4,))).build()
    res = interp.interp_scalar(2.2)
    assert np.asarray(res).shape == ()


def test_interp_into_too_small():
    # mod.rs:549-555
    interp = Interp1D.builder(rand_arr((4, 4))).build()
    buf = np.zeros(3)
    with pytest.raises(ValueError, match=r"expected: \[4\], got: \[3\]"):
        interp.interp_into(2.2, buf)


def test_interp_into_too_big():
    # mod.rs:557-563
    interp = Interp1D.builder(rand_arr((4, 4))).build()
    buf = np.zeros(5)
    with pytest.raises(ValueError, match=r"expected: \[4\], got: \[5\]"):
        interp.interp_into(2.2, buf)


@pytest.mark.parametrize(
    "buf_shape", [(1, 4), (2, 3), (3, 4), (2, 5)]
)
def test_interp_array_into_wrong_shapes(buf_shape):
    # mod.rs:565-607
    interp = Interp1D.builder(rand_arr((4, 4))).build()
    buf = np.zeros(buf_shape)
    with pytest.raises(ValueError):
        interp.interp_array_into(jnp.array([2.2, 2.4]), buf)


def test_integer_data():
    # the reference is generic over integer elements
    # (tests/interp1d.rs:15-18 pins truncating casts)
    interp = Interp1D.builder(jnp.array([10, 20, 40])).build()
    assert int(interp.interp_scalar(1)) == 20
    assert int(interp.interp_scalar(2)) == 40


def test_partial_oob_aborts_whole_call():
    # mod.rs:321 — any OOB point aborts the whole interp_array call
    interp = Interp1D.builder(jnp.array([1.0, 2.0, 3.0])).build()
    with pytest.raises(OutOfBoundsError):
        interp.interp_array(jnp.array([0.5, 99.0]))
