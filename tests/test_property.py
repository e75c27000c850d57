"""Property tests: random axes/data/queries vs the SciPy oracle.

The reference treats SciPy as ground truth for cubic splines
(``tests/cubic_spline_strat.rs:19-26``); these tests extend that to
randomized fixtures across every strategy and boundary family, plus
numpy.interp for the linear strategy.
"""

import numpy as np
import pytest
import scipy.interpolate as si

import jax.numpy as jnp

from ndarray_interp_tpu.interp1d import (
    Akima,
    CubicSpline,
    Interp1D,
    Linear,
    Pchip,
)
from ndarray_interp_tpu.interp1d.cubic_spline import BoundaryCondition
from ndarray_interp_tpu.interp2d import Interp2D

SEEDS = [1, 7, 42]


def axis(rng, n, spacing):
    if spacing == "uniform":
        return np.linspace(0.0, 10.0, n)
    if spacing == "log":
        return np.logspace(0.0, 1.0, n)
    x = np.sort(rng.uniform(0.0, 10.0, n))
    x[0], x[-1] = 0.0, 10.0
    return x


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("spacing", ["uniform", "random", "log"])
def test_linear_vs_numpy_interp(seed, spacing):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 40))
    x = axis(rng, n, spacing)
    y = rng.normal(size=n)
    q = rng.uniform(x[0], x[-1], 257)
    itp = Interp1D.builder(jnp.asarray(y)).x(jnp.asarray(x)).build()
    np.testing.assert_allclose(
        np.asarray(itp.interp_array(jnp.asarray(q))),
        np.interp(q, x, y),
        atol=1e-12,
    )


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize(
    "bc_ours,bc_scipy",
    [
        (BoundaryCondition.NotAKnot, "not-a-knot"),
        (BoundaryCondition.Natural, "natural"),
        (BoundaryCondition.Clamped, "clamped"),
    ],
)
def test_cubic_random_fixtures(seed, bc_ours, bc_scipy):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 50))
    x = axis(rng, n, "random")
    y = rng.normal(size=(n, int(rng.integers(1, 4))))
    q = rng.uniform(x[0] - 2, x[-1] + 2, 301)
    itp = (
        Interp1D.builder(jnp.asarray(y))
        .x(jnp.asarray(x))
        .strategy(CubicSpline().extrapolate(True).boundary(bc_ours))
        .build()
    )
    oracle = si.CubicSpline(x, y, bc_type=bc_scipy)
    np.testing.assert_allclose(
        np.asarray(itp.interp_array(jnp.asarray(q))),
        oracle(q),
        rtol=1e-8,
        atol=1e-8,
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_cubic_periodic_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 30))
    x = axis(rng, n, "random")
    y = rng.normal(size=n)
    y[-1] = y[0]
    q = rng.uniform(x[0] - 13, x[-1] + 13, 301)
    itp = (
        Interp1D.builder(jnp.asarray(y))
        .x(jnp.asarray(x))
        .strategy(
            CubicSpline().extrapolate(True).boundary(BoundaryCondition.Periodic)
        )
        .build()
    )
    oracle = si.CubicSpline(x, y, bc_type="periodic")
    span = x[-1] - x[0]
    qw = np.mod(q - x[0], span) + x[0]
    np.testing.assert_allclose(
        np.asarray(itp.interp_array(jnp.asarray(q))),
        oracle(qw),
        rtol=1e-8,
        atol=1e-8,
    )


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("strategy_cls,oracle_cls", [
    (Akima, si.Akima1DInterpolator),
    (Pchip, si.PchipInterpolator),
])
def test_hermite_strategies_random(seed, strategy_cls, oracle_cls):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 40))
    x = axis(rng, n, "random")
    y = rng.normal(size=n)
    q = rng.uniform(x[0], x[-1], 301)
    itp = (
        Interp1D.builder(jnp.asarray(y))
        .x(jnp.asarray(x))
        .strategy(strategy_cls())
        .build()
    )
    np.testing.assert_allclose(
        np.asarray(itp.interp_array(jnp.asarray(q))),
        oracle_cls(x, y)(q),
        rtol=1e-9,
        atol=1e-9,
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_bilinear_random_fixtures(seed):
    rng = np.random.default_rng(seed)
    nx = int(rng.integers(2, 30))
    ny = int(rng.integers(2, 30))
    x = axis(rng, nx, "random")
    y = axis(rng, ny, "uniform")
    z = rng.normal(size=(nx, ny))
    qx = rng.uniform(x[0], x[-1], 301)
    qy = rng.uniform(y[0], y[-1], 301)
    itp = (
        Interp2D.builder(jnp.asarray(z))
        .x(jnp.asarray(x))
        .y(jnp.asarray(y))
        .build()
    )
    oracle = si.RegularGridInterpolator((x, y), z, method="linear")
    np.testing.assert_allclose(
        np.asarray(itp.interp_array(jnp.asarray(qx), jnp.asarray(qy))),
        oracle(np.stack([qx, qy], -1)),
        rtol=1e-10,
        atol=1e-10,
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_native_batch_agrees_with_jax_random(seed):
    """The numpy-input (native) and jax-input paths agree on random data."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 40))
    x = axis(rng, n, "random")
    y = rng.normal(size=n)
    q = rng.uniform(x[0] - 1, x[-1] + 1, 123)
    itp = (
        Interp1D.builder(y)  # numpy input → host copies captured
        .x(x)
        .strategy(CubicSpline().extrapolate(True))
        .build()
    )
    native_out = itp.interp_array(q)  # numpy in → native path
    jax_out = itp.interp_array(jnp.asarray(q))  # jax in → device path
    assert isinstance(native_out, np.ndarray)
    np.testing.assert_allclose(
        native_out, np.asarray(jax_out), rtol=1e-13, atol=1e-13
    )


@pytest.mark.parametrize("seed", [13, 21, 99])
def test_individual_boundaries_random_vs_scipy(seed):
    """Random per-row boundary assignments vs per-column SciPy splines."""
    from ndarray_interp_tpu.interp1d.cubic_spline import (
        RowBoundary,
        SingleBoundary,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 24))
    bank = int(rng.integers(2, 5))
    x = axis(rng, n, "random")
    y = rng.normal(size=(n, bank))

    kinds = ["not-a-knot", "natural", "clamped", (1, 0.7), (2, -1.3)]

    def to_single(k):
        if k == "not-a-knot":
            return SingleBoundary.NotAKnot
        if k == "natural":
            return SingleBoundary.Natural
        if k == "clamped":
            return SingleBoundary.Clamped
        d, v = k
        return (
            SingleBoundary.FirstDeriv(v)
            if d == 1
            else SingleBoundary.SecondDeriv(v)
        )

    def to_scipy(k):
        return k if isinstance(k, (str, tuple)) else k

    picks = [
        (kinds[rng.integers(0, 5)], kinds[rng.integers(0, 5)])
        for _ in range(bank)
    ]
    rows = np.array(
        [[RowBoundary.Mixed(to_single(l), to_single(r)) for l, r in picks]],
        dtype=object,
    )
    itp = (
        Interp1D.builder(jnp.asarray(y))
        .x(jnp.asarray(x))
        .strategy(
            CubicSpline()
            .extrapolate(True)
            .boundary(BoundaryCondition.Individual(rows))
        )
        .build()
    )
    q = rng.uniform(x[0] - 1, x[-1] + 1, 151)
    got = np.asarray(itp.interp_array(jnp.asarray(q)))
    for col, (l, r) in enumerate(picks):
        oracle = si.CubicSpline(
            x, y[:, col], bc_type=(to_scipy(l), to_scipy(r))
        )
        np.testing.assert_allclose(
            got[:, col], oracle(q), rtol=1e-7, atol=1e-7,
            err_msg=f"col {col} bounds {l}/{r}",
        )
