"""Gather-route banked evaluation (fused index+frac -> one packed-row
gather -> streaming Hermite tail) — interpret-mode tests vs the gather
formulation oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ndarray_interp_tpu.ops.pallas_eval import _index_frac_impl as fused_index_frac
from ndarray_interp_tpu.ops.pallas_tail import (
    _gather_form_2d,
    _gathered_impl,
    banked_hermite_tail,
    pack_bank_rows,
)
from ndarray_interp_tpu.ops.searchsorted import get_lower_index


def fixture(n=512, bank=48, nq=1024, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.cumsum(rng.uniform(0.1, 1.0, n)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(size=(n, bank)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(n - 1, bank)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(n - 1, bank)).astype(np.float32))
    lo, hi = float(x[0]), float(x[-1])
    q = jnp.asarray(
        np.r_[
            rng.uniform(lo - 1, hi + 1, nq - 4),
            [lo, hi, np.inf, -np.inf],
        ].astype(np.float32)
    )
    return x, d2, a2, b2, q


def test_fused_index_frac_matches_oracle():
    x, _, _, _, q = fixture()
    idx, t = fused_index_frac(x, q, interpret=True)
    want_idx = np.asarray(get_lower_index(x, q))
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    x_np = np.asarray(x)
    want_t = (np.asarray(q) - x_np[want_idx]) / (
        x_np[want_idx + 1] - x_np[want_idx]
    )
    np.testing.assert_array_equal(np.asarray(t), want_t)


def test_fused_index_frac_nan_query():
    x, _, _, _, _ = fixture()
    idx, t = fused_index_frac(
        x, jnp.asarray([np.nan, float(x[3])], jnp.float32), interpret=True
    )
    assert np.isnan(np.asarray(t)[0])
    assert np.asarray(idx)[1] == 3


def test_gathered_route_matches_gather_form():
    x, d2, a2, b2, q = fixture()
    idx, t = fused_index_frac(x, q, interpret=True)
    got = _gathered_impl(d2, a2, b2, idx, t, interpret=True)
    want = _gather_form_2d(d2, a2, b2, idx, t)
    # 1-ulp FMA-contraction differences between the interpret-mode
    # compile and the eager oracle; bit-exactness on real hardware is
    # pinned in tests/test_tpu_parity.py
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("bank", [1, 7, 128, 130])
def test_tail_bank_padding(bank):
    """Channel padding to 128-lane boundaries must not leak into results."""
    rng = np.random.default_rng(bank)
    nq, nrow = 130, 16
    d2 = jnp.asarray(rng.normal(size=(nrow, bank)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(nrow - 1, bank)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(nrow - 1, bank)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, nrow - 1, nq), jnp.int32)
    t = jnp.asarray(rng.uniform(-0.5, 1.5, nq).astype(np.float32))
    got = _gathered_impl(d2, a2, b2, idx, t, interpret=True)
    want = _gather_form_2d(d2, a2, b2, idx, t)
    assert got.shape == (nq, bank)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_packed_rows_layout():
    x, d2, a2, b2, _ = fixture(n=8, bank=3)
    packed = pack_bank_rows(d2, a2, b2)
    assert packed.shape == (7, 4 * 8)  # tight: bank padded to 8 lanes
    np.testing.assert_array_equal(np.asarray(packed[:, :3]), np.asarray(d2[:-1]))
    np.testing.assert_array_equal(
        np.asarray(packed[:, 8:11]), np.asarray(d2[1:])
    )
    np.testing.assert_array_equal(np.asarray(packed[:, 3:8]), 0.0)


def test_gathered_route_nan_localization():
    """A non-finite datum poisons only queries that touch its intervals
    (reference/take semantics — unlike the one-hot MXU select)."""
    x, d2, a2, b2, _ = fixture(n=64, bank=4)
    d2 = d2.at[32, 2].set(jnp.nan)
    q = jnp.asarray(
        [float(x[5]) + 0.1, float(x[31]) + 1e-4, float(x[50])], jnp.float32
    )
    idx, t = fused_index_frac(x, q, interpret=True)
    got = np.asarray(_gathered_impl(d2, a2, b2, idx, t, interpret=True))
    assert np.isfinite(got[0]).all() and np.isfinite(got[2]).all()
    assert np.isnan(got[1, 2]) and np.isfinite(got[1, [0, 1, 3]]).all()


def test_gathered_route_bwd_matches_gather_form_grads():
    """The custom_vjp backward (what jax.grad uses in production, where
    the forward runs the compiled kernel) must equal autodiff through
    the gather formulation."""
    from ndarray_interp_tpu.ops.pallas_tail import _bwd

    x, d2, a2, b2, q = fixture(n=64, bank=8, nq=64)
    idx, t = fused_index_frac(x, q, interpret=True)
    out = _gather_form_2d(d2, a2, b2, idx, t)
    g = 2.0 * out  # cotangent of sum(out**2)

    def loss_oracle(d2, a2, b2, t):
        return jnp.sum(_gather_form_2d(d2, a2, b2, idx, t) ** 2)

    want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(d2, a2, b2, t)
    gd, ga, gb, _, gt = _bwd((d2, a2, b2, idx, t), g)
    for a_, b_ in zip(want, (gd, ga, gb, gt)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-5
        )


# -- bilinear gather route -----------------------------------------------


def bl_fixture(nx=64, ny=48, r=5, nq=1024, seed=3):
    from ndarray_interp_tpu.models.strategies.bilinear import pack_corner_rows

    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.cumsum(rng.uniform(0.1, 1.0, nx)).astype(np.float32))
    y = jnp.asarray(np.cumsum(rng.uniform(0.1, 1.0, ny)).astype(np.float32))
    data = jnp.asarray(rng.normal(size=(nx, ny, r)).astype(np.float32))
    rows = pack_corner_rows(x, y, data).reshape((nx - 1) * (ny - 1), -1)
    qx = jnp.asarray(
        rng.uniform(float(x[0]) - 1, float(x[-1]) + 1, nq).astype(np.float32)
    )
    qy = jnp.asarray(
        rng.uniform(float(y[0]) - 1, float(y[-1]) + 1, nq).astype(np.float32)
    )
    return x, y, data, rows, qx, qy


def test_bilinear_gathered_matches_xla_form():
    from ndarray_interp_tpu.ops.pallas_eval import _cell_index_impl
    from ndarray_interp_tpu.ops.pallas_tail import (
        _bilinear_gathered_impl,
        _bilinear_xla_form,
    )

    x, y, data, rows, qx, qy = bl_fixture()
    r = data.shape[2]
    cell, _, _ = _cell_index_impl(x, y, qx, qy, interpret=True)
    got = _bilinear_gathered_impl(rows, cell, qx, qy, r, interpret=True)
    want = _bilinear_xla_form(rows, cell, qx, qy, r)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_bilinear_gathered_matches_strategy_oracle():
    """End-to-end: gather route equals the separated bilinear path."""
    from ndarray_interp_tpu.interp2d import Interp2D
    from ndarray_interp_tpu.ops.pallas_eval import _cell_index_impl
    from ndarray_interp_tpu.ops.pallas_tail import _bilinear_gathered_impl

    x, y, data, rows, qx, qy = bl_fixture()
    r = data.shape[2]
    itp = Interp2D.builder(data).x(x).y(y).build()
    # in-range queries only (builder default: no extrapolation)
    qx = jnp.clip(qx, float(x[0]), float(x[-1]))
    qy = jnp.clip(qy, float(y[0]), float(y[-1]))
    want = itp.interp_array(qx, qy)
    cell, _, _ = _cell_index_impl(x, y, qx, qy, interpret=True)
    got = _bilinear_gathered_impl(rows, cell, qx, qy, r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want).reshape(got.shape),
        rtol=1e-5, atol=1e-5,
    )


def test_bilinear_bwd_matches_xla_grads():
    from ndarray_interp_tpu.ops.pallas_eval import _cell_index_impl
    from ndarray_interp_tpu.ops.pallas_tail import (
        _bilinear_xla_form,
        _bl_bwd,
    )

    x, y, data, rows, qx, qy = bl_fixture(nq=128)
    r = data.shape[2]
    cell, _, _ = _cell_index_impl(x, y, qx, qy, interpret=True)
    out = _bilinear_xla_form(rows, cell, qx, qy, r)
    g = 2.0 * out

    def loss(rows, qx, qy):
        return jnp.sum(_bilinear_xla_form(rows, cell, qx, qy, r) ** 2)

    want = jax.grad(loss, argnums=(0, 1, 2))(rows, qx, qy)
    gr, _, gx, gy = _bl_bwd(r, (rows, cell, qx, qy), g)
    for a_, b_ in zip(want, (gr, gx, gy)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-5
        )


def test_index_frac_bwd_matches_xla_grads():
    from ndarray_interp_tpu.ops.pallas_eval import _index_frac_bwd

    x, _, _, _, q = fixture(n=64, nq=128)
    q = jnp.clip(q, float(x[0]), float(x[-1]))  # finite grads only
    idx, t = fused_index_frac(x, q, interpret=True)

    def frac_loss(x, q):
        xl = x[np.asarray(idx)]
        xr = x[np.asarray(idx) + 1]
        return jnp.sum(((q - xl) / (xr - xl)) ** 2)

    want = jax.grad(frac_loss, argnums=(0, 1))(x, q)
    g_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    gx, gq = _index_frac_bwd((x, q, idx), (g_idx, 2.0 * t))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(want[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(want[1]), rtol=1e-5, atol=1e-5)


# -- bicubic weight-form tail (round 3) ---------------------------------------


def bc_fixture(nx=24, ny=20, r=8, nq=1024, seed=5, extrapolate=True):
    from ndarray_interp_tpu.models.strategies.bicubic import Bicubic

    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.cumsum(rng.uniform(0.2, 1.0, nx)).astype(np.float32))
    y = jnp.asarray(np.cumsum(rng.uniform(0.2, 1.0, ny)).astype(np.float32))
    data = jnp.asarray(rng.normal(size=(nx, ny, r)).astype(np.float32))
    strat = Bicubic(extrapolate=extrapolate).build(x, y, data)
    pad = 1.0 if extrapolate else 0.0
    qx = jnp.asarray(
        rng.uniform(float(x[0]) - pad, float(x[-1]) + pad, nq).astype(
            np.float32
        )
    )
    qy = jnp.asarray(
        rng.uniform(float(y[0]) - pad, float(y[-1]) + pad, nq).astype(
            np.float32
        )
    )
    return x, y, data, strat.rows, qx, qy


def _bc_cell_index(x, y, qx, qy, ny):
    from ndarray_interp_tpu.ops.searchsorted import get_lower_index

    xi = get_lower_index(x, qx)
    yi = get_lower_index(y, qy)
    tx = (qx - x[xi]) / (x[xi + 1] - x[xi])
    ty = (qy - y[yi]) / (y[yi + 1] - y[yi])
    return xi * (ny - 1) + yi, tx, ty


def test_bicubic_weight_tail_matches_nested():
    """The weight form is the closed form of the 5-Hermite nesting."""
    from ndarray_interp_tpu.models.strategies.bicubic import _cell_tail_nested
    from ndarray_interp_tpu.ops.pallas_tail import bicubic_weight_tail

    x, y, data, rows_tbl, qx, qy = bc_fixture()
    r = data.shape[2]
    cell, tx, ty = _bc_cell_index(x, y, qx, qy, data.shape[1])
    rows = jnp.take(rows_tbl, cell, axis=0)
    got = bicubic_weight_tail(rows, tx, ty, r, interpret=True)
    want = _cell_tail_nested(rows, tx[:, None], ty[:, None], r)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_bicubic_gathered_matches_strategy_oracle():
    """End-to-end: the gather route equals the strategy's XLA path."""
    from ndarray_interp_tpu.interp2d import Interp2D
    from ndarray_interp_tpu.models.strategies.bicubic import Bicubic
    from ndarray_interp_tpu.ops.pallas_tail import _bicubic_gathered_impl

    x, y, data, rows_tbl, qx, qy = bc_fixture(extrapolate=False)
    r = data.shape[2]
    itp = (
        Interp2D.builder(data).x(x).y(y).strategy(Bicubic()).build()
    )
    qx = jnp.clip(qx, float(x[0]), float(x[-1]))
    qy = jnp.clip(qy, float(y[0]), float(y[-1]))
    want = itp.interp_array(qx, qy)
    cell, tx, ty = _bc_cell_index(x, y, qx, qy, data.shape[1])
    got = _bicubic_gathered_impl(rows_tbl, cell, tx, ty, r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want).reshape(got.shape),
        rtol=2e-5, atol=2e-5,
    )


def test_bicubic_weight_tail_unaligned_r():
    """r with 16r not a multiple of 128 still runs (any r the packed
    table carries; the strategy only ROUTES here when lane-aligned)."""
    from ndarray_interp_tpu.models.strategies.bicubic import _cell_tail_nested
    from ndarray_interp_tpu.ops.pallas_tail import bicubic_weight_tail

    x, y, data, rows_tbl, qx, qy = bc_fixture(r=5, nq=512)
    r = 5
    cell, tx, ty = _bc_cell_index(x, y, qx, qy, data.shape[1])
    rows = jnp.take(rows_tbl, cell, axis=0)
    got = bicubic_weight_tail(rows, tx, ty, r, interpret=True)
    want = _cell_tail_nested(rows, tx[:, None], ty[:, None], r)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_bicubic_bwd_matches_xla_grads():
    from ndarray_interp_tpu.ops.pallas_tail import (
        _bc_bwd,
        _bicubic_weight_xla,
    )

    x, y, data, rows_tbl, qx, qy = bc_fixture(nq=128)
    r = data.shape[2]
    cell, tx, ty = _bc_cell_index(x, y, qx, qy, data.shape[1])
    out = _bicubic_weight_xla(jnp.take(rows_tbl, cell, axis=0), tx, ty, r)
    g = 2.0 * out

    def loss(rows_tbl, tx, ty):
        return jnp.sum(
            _bicubic_weight_xla(jnp.take(rows_tbl, cell, axis=0), tx, ty, r)
            ** 2
        )

    want = jax.grad(loss, argnums=(0, 1, 2))(rows_tbl, tx, ty)
    gr, _, gx, gy = _bc_bwd(r, (rows_tbl, cell, tx, ty), g)
    for a_, b_ in zip(want, (gr, gx, gy)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-4
        )
