"""Large-knot-axis (n > 64k) hierarchical search + gather evaluation.

Pure-XLA ops, so the full semantics are testable on CPU against the
small-n oracles: ``get_lower_index`` and the gather formulation
(``pallas_eval._eval_xla``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ndarray_interp_tpu.ops import pallas_eval
from ndarray_interp_tpu.ops.bigknots import (
    _big_eval_impl,
    big_eval_1d,
    big_lower_index_frac,
    can_use_big,
)
from ndarray_interp_tpu.ops.searchsorted import get_lower_index


def fixture(n=70_001, nq=4096, seed=0, uniform=False):
    rng = np.random.default_rng(seed)
    if uniform:
        x = np.linspace(0.0, 1.0, n).astype(np.float32)
    else:
        x = np.cumsum(rng.uniform(0.01, 1.0, n)).astype(np.float32)
        x = np.asarray(np.unique(x), np.float32)  # strictly rising in f32
    n = x.shape[0]
    d = rng.normal(size=n).astype(np.float32)
    a = rng.normal(size=n - 1).astype(np.float32)
    b = rng.normal(size=n - 1).astype(np.float32)
    lo, hi = float(x[0]), float(x[-1])
    q = np.r_[
        rng.uniform(lo - 2, hi + 2, nq - 6),
        [lo, hi, np.inf, -np.inf, x[n // 2], x[1]],
    ].astype(np.float32)
    J = jnp.asarray
    return J(x), J(d), J(a), J(b), J(q)


@pytest.mark.parametrize("uniform", [False, True])
@pytest.mark.parametrize("search", ["xla", "pallas-interpret"])
def test_big_lower_index_matches_oracle(uniform, search):
    x, _, _, _, q = fixture(uniform=uniform)
    kw = (
        dict(pallas=False)
        if search == "xla"
        else dict(pallas=True, interpret=True)
    )
    idx, t = big_lower_index_frac(x, q, **kw)
    want = np.asarray(get_lower_index(x, q))
    np.testing.assert_array_equal(np.asarray(idx), want)
    xn = np.asarray(x)
    want_t = (np.asarray(q) - xn[want]) / (xn[want + 1] - xn[want])
    np.testing.assert_array_equal(np.asarray(t), want_t)


def test_big_eval_matches_gather_formulation():
    x, d, a, b, q = fixture()
    tbl = pallas_eval.make_interval_table(x, d, a, b)
    want = np.asarray(pallas_eval._eval_xla(x, tbl, q))
    got = np.asarray(_big_eval_impl(x, d, a, b, q, pallas=False))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_big_eval_linear_inf():
    n = 70_000
    x = jnp.asarray(np.linspace(0.0, 1.0, n), jnp.float32)
    d = 3.0 * x + 1.0
    z = jnp.zeros((n - 1,), jnp.float32)
    got = np.asarray(
        _big_eval_impl(
            x, d, z, z, jnp.asarray([np.inf, -np.inf], jnp.float32),
            pallas=False,
        )
    )
    assert got[0] == np.inf and got[1] == -np.inf


def test_big_eval_nan_query():
    x, d, a, b, _ = fixture(nq=8)
    got = np.asarray(
        _big_eval_impl(
            x, d, a, b, jnp.asarray([np.nan, float(x[10])], jnp.float32),
            pallas=False,
        )
    )
    assert np.isnan(got[0]) and np.isfinite(got[1])


def test_big_eval_bwd_matches_formulation_grads():
    """The custom_vjp backward (used in production where the forward
    runs the Pallas-search route) equals autodiff through the gather
    formulation."""
    from ndarray_interp_tpu.ops.bigknots import _be_bwd

    x, d, a, b, q = fixture(nq=256)
    q = jnp.clip(q, float(x[0]), float(x[-1]))
    tbl = pallas_eval.make_interval_table(x, d, a, b)
    out = pallas_eval._eval_xla(x, tbl, q)
    g = 2.0 * out

    def loss_ref(d, a, b, q):
        tbl = pallas_eval.make_interval_table(x, d, a, b)
        return jnp.sum(pallas_eval._eval_xla(x, tbl, q) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(d, a, b, q)
    _, gd, ga, gb, gq = _be_bwd((x, d, a, b, q), g)
    for a_, b_ in zip(want, (gd, ga, gb, gq)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-4
        )


def test_eligibility():
    small = jnp.zeros((100,), jnp.float32)
    big = jnp.zeros((100_000,), jnp.float32)
    d_small = jnp.zeros((100,), jnp.float32)
    d_big = jnp.zeros((100_000,), jnp.float32)
    assert not can_use_big(small, d_small)
    assert can_use_big(big, d_big)
    assert not can_use_big(big.astype(jnp.float64), d_big.astype(jnp.float64))
    assert not can_use_big(big, jnp.zeros((100_000, 2), jnp.float32))


def test_strategy_routes_big_n_on_cpu_fallback():
    """On CPU the platform_dependent default still runs: the public API
    stays correct for n > 64k regardless of backend."""
    from ndarray_interp_tpu.interp1d import Interp1D
    from ndarray_interp_tpu.interp1d.cubic_spline import (
        CubicSpline,
        CubicSplineStrategy,
    )

    x, d, a, b, q = fixture(n=66_000, nq=512)
    itp = Interp1D.new_unchecked(x, d, CubicSplineStrategy(a, b, "yes"))
    got = np.asarray(itp(q))
    tbl = pallas_eval.make_interval_table(x, d, a, b)
    want = np.asarray(pallas_eval._eval_xla(x, tbl, q))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_akima_pchip_inherit_big_route_on_cpu():
    """Akima/PCHIP lower to CubicSplineStrategy coefficients, so n > 64k
    interpolators stay correct through the public API on every backend."""
    from ndarray_interp_tpu.interp1d import Interp1D
    from ndarray_interp_tpu.models.strategies.hermite import Akima

    rng = np.random.default_rng(9)
    n = 66_000
    x = jnp.asarray(np.linspace(0.0, 1.0, n), jnp.float32)
    d = jnp.asarray(rng.normal(size=n).astype(np.float32))
    itp = Interp1D.builder(d).x(x).strategy(Akima(extrapolate=True)).build()
    q = jnp.asarray(rng.uniform(-0.05, 1.05, 512).astype(np.float32))
    got = np.asarray(itp(q))
    s = itp.strategy
    tbl = pallas_eval.make_interval_table(x, d, s.a, s.b)
    want = np.asarray(pallas_eval._eval_xla(x, tbl, q))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_max_big_knots_is_consistent():
    """can_use_big's upper bound must be servable by _block_w (review
    finding: 8M advertised but W=128 needs ceil(n/128)+1 <= 65536)."""
    from ndarray_interp_tpu.ops.bigknots import (
        MAX_BIG_KNOTS,
        _block_w,
        _geometry,
    )

    assert _block_w(MAX_BIG_KNOTS) == 128
    _geometry(MAX_BIG_KNOTS)  # must not raise
    big = jnp.zeros((MAX_BIG_KNOTS,), jnp.float32)
    assert can_use_big(big, big)
    with pytest.raises(ValueError):
        _block_w(MAX_BIG_KNOTS + 1)


def test_nonfinite_data_routes_off_big_kernel():
    """The big-route window mask-select poisons whole W-knot blocks on
    NaN data, so the dispatch must require the finite hint (PARITY D5).

    Cubic coefficients are global (one NaN datum NaNs the whole solve),
    so the localization contract only bites for interpolators assembled
    via ``new_unchecked`` with finite coefficients but non-finite data —
    exactly what the finite=False hint marks."""
    from ndarray_interp_tpu.interp1d import Interp1D
    from ndarray_interp_tpu.interp1d.cubic_spline import CubicSplineStrategy

    n = 66_000
    rng = np.random.default_rng(11)
    x = jnp.asarray(np.linspace(0.0, 1.0, n), jnp.float32)
    d = jnp.asarray(rng.normal(size=n).astype(np.float32)).at[1000].set(
        jnp.nan
    )
    a = jnp.asarray(rng.normal(size=n - 1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=n - 1).astype(np.float32))
    strat = CubicSplineStrategy(a, b, "yes", finite=False)
    itp = Interp1D.new_unchecked(x, d, strat)
    # sanity: the mask-select formulation does poison the whole block —
    # the reason the guard exists (W=16: block 62 spans knots 992..1008)
    got = _big_eval_impl(
        x, d, a, b,
        jnp.asarray([float(x[995]) + 1e-6], jnp.float32),
        pallas=False,
    )
    assert np.isnan(np.asarray(got))[0]
    # public API: NaN stays localized to the adjacent intervals
    q = jnp.asarray(
        [float(x[10]) + 1e-6, float(x[40000]) + 1e-6], jnp.float32
    )
    out = np.asarray(itp(q))
    assert np.isfinite(out).all()
    bad = np.asarray(itp(jnp.asarray([float(x[1000]) + 1e-6], jnp.float32)))
    assert np.isnan(bad).all()


def test_mosaic_refine_tail_record():
    """Round-3 negative result (kept with tests): the Mosaic refine
    tail is bit-equivalent to the XLA refine on the aligned layout but
    measured SLOWER on chip (15.5 vs 12.1 ms/1M at 262k knots — see the
    module comment).  Pin the equivalence in interpret mode."""
    import jax

    from ndarray_interp_tpu.ops.bigknots import (
        _big_eval_impl,
        _block_of,
        _geometry,
        _pack_rows_aligned,
        _pad_knots,
        _refine_and_eval_aligned,
        _refine_and_eval_mosaic,
    )

    rng = np.random.default_rng(51)
    n, nq = 66_000, 4096
    x = jnp.asarray(np.linspace(0.0, 1.0, n), jnp.float32)
    d = jnp.asarray(rng.normal(size=n).astype(np.float32))
    a = jnp.asarray(rng.normal(size=n - 1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=n - 1).astype(np.float32))
    q = jnp.asarray(rng.uniform(-0.1, 1.1, nq).astype(np.float32))
    w, c, c1, c2 = _geometry(n)
    assert w == 16
    kp = _pad_knots(x, w, c1, c2)
    block = _block_of(kp, n, w, c, c1, c2, q, pallas=False)
    rows = jnp.take(_pack_rows_aligned(kp, d, a, b, w, c), block, axis=0)
    got = np.asarray(
        _refine_and_eval_mosaic(rows, block, q, n, w, interpret=True)
    )
    want = np.asarray(_refine_and_eval_aligned(rows, block, q, n, w)[2])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # and the aligned XLA refine matches the production path
    prod = np.asarray(
        jax.jit(lambda *t: _big_eval_impl(*t, pallas=False))(x, d, a, b, q)
    )
    np.testing.assert_allclose(want, prod, rtol=1e-6, atol=1e-6)
