"""Bicubic (tensor-product not-a-knot cubic spline) — beyond-reference
2-D strategy.

Oracle: sequential SciPy ``CubicSpline`` (not-a-knot) per axis — the
defining construction of the tensor-product spline, and the same oracle
family the reference uses for its 1-D cubic tests
(``/root/reference/tests/cubic_spline_strat.rs``).  (SciPy's
``RegularGridInterpolator(method="cubic")`` differs from the true tensor
NAK spline at ~1e-4; the sequential construction is exact.)
"""

import numpy as np
import pytest
import scipy.interpolate as si

import jax
import jax.numpy as jnp

from ndarray_interp_tpu.interp2d import Bicubic, Interp2D


def tensor_oracle(x, y, z, qx, qy):
    """Sequential per-axis NAK CubicSpline evaluation (exact tensor)."""
    g = si.CubicSpline(x, z, axis=0, bc_type="not-a-knot")(qx)  # (Q, ny, ...)
    out = np.empty(qx.shape + z.shape[2:])
    for i in range(qx.shape[0]):
        out[i] = si.CubicSpline(y, g[i], axis=0, bc_type="not-a-knot")(qy[i])
    return out


def fixture(nx=14, ny=11, trailing=(), seed=0):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.uniform(0.2, 1.0, nx))
    y = np.cumsum(rng.uniform(0.2, 1.0, ny))
    z = rng.normal(size=(nx, ny) + trailing)
    return x, y, z, rng


def build(x, y, z, extrapolate=True):
    return (
        Interp2D.builder(jnp.asarray(z))
        .x(jnp.asarray(x))
        .y(jnp.asarray(y))
        .strategy(Bicubic().extrapolate(extrapolate))
        .build()
    )


class TestBicubic:
    def test_matches_sequential_scipy_oracle(self):
        x, y, z, rng = fixture()
        itp = build(x, y, z)
        qx = rng.uniform(x[0], x[-1], 400)
        qy = rng.uniform(y[0], y[-1], 400)
        got = np.asarray(itp.interp_array(qx, qy))
        want = tensor_oracle(x, y, z, qx, qy)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_knot_exactness(self):
        x, y, z, _ = fixture()
        itp = build(x, y, z)
        xi, yi = np.meshgrid(x, y, indexing="ij")
        got = np.asarray(itp.interp_array(xi.ravel(), yi.ravel()))
        np.testing.assert_allclose(got, z.ravel(), rtol=1e-12, atol=1e-12)

    def test_trailing_dims(self):
        x, y, z, rng = fixture(trailing=(3,))
        itp = build(x, y, z)
        qx = rng.uniform(x[0], x[-1], 50)
        qy = rng.uniform(y[0], y[-1], 50)
        got = np.asarray(itp.interp_array(qx, qy))
        assert got.shape == (50, 3)
        want = tensor_oracle(x, y, z, qx, qy)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_extrapolation_continues_edge_patch(self):
        x, y, z, rng = fixture()
        itp = build(x, y, z)
        # extrapolated points evaluate the edge cell's polynomial —
        # same contract as the 1-D cubic (clamped interval indices)
        got = np.asarray(
            itp.interp_array(
                np.asarray([x[0] - 0.5, x[-1] + 0.5]),
                np.asarray([y[0] - 0.3, y[-1] + 0.3]),
            )
        )
        assert np.isfinite(got).all()

    def test_oob_raises_without_extrapolate(self):
        from ndarray_interp_tpu.errors import OutOfBoundsError

        x, y, z, _ = fixture()
        itp = build(x, y, z, extrapolate=False)
        with pytest.raises(OutOfBoundsError):
            itp.interp_array(np.asarray([x[0] - 1.0]), np.asarray([y[2]]))

    def test_min_points_enforced(self):
        from ndarray_interp_tpu.errors import NotEnoughDataError

        with pytest.raises(NotEnoughDataError):
            (
                Interp2D.builder(jnp.zeros((2, 5)))
                .strategy(Bicubic())
                .build()
            )

    def test_jit_and_grad(self):
        x, y, z, rng = fixture()
        itp = build(x, y, z)
        qx = jnp.asarray(rng.uniform(x[0], x[-1], 32))
        qy = jnp.asarray(rng.uniform(y[0], y[-1], 32))
        f = jax.jit(lambda t, a, b: t(a, b))
        np.testing.assert_allclose(
            np.asarray(f(itp, qx, qy)),
            np.asarray(itp.interp_array(qx, qy)),
            rtol=1e-12,
        )
        g = jax.grad(lambda a: jnp.sum(itp(a, qy) ** 2))(qx)
        assert np.isfinite(np.asarray(g)).all()

    def test_checkpoint_roundtrip(self, tmp_path):
        from ndarray_interp_tpu.utils import checkpoint

        x, y, z, rng = fixture()
        itp = build(x, y, z)
        p = tmp_path / "bicubic.npz"
        checkpoint.save(p, itp)
        back = checkpoint.load(p)
        qx = rng.uniform(x[0], x[-1], 20)
        qy = rng.uniform(y[0], y[-1], 20)
        np.testing.assert_allclose(
            np.asarray(back.interp_array(qx, qy)),
            np.asarray(itp.interp_array(qx, qy)),
        )

    def test_smooth_function_convergence(self):
        """On a smooth function the bicubic error is orders below
        bilinear's."""
        x = np.linspace(0, np.pi, 24)
        y = np.linspace(0, np.pi, 20)
        z = np.sin(x)[:, None] * np.cos(y)[None, :]
        rng = np.random.default_rng(5)
        qx = rng.uniform(0, np.pi, 500)
        qy = rng.uniform(0, np.pi, 500)
        truth = np.sin(qx) * np.cos(qy)
        cubic = np.asarray(build(x, y, z).interp_array(qx, qy))
        lin = np.asarray(
            Interp2D.builder(jnp.asarray(z))
            .x(jnp.asarray(x))
            .y(jnp.asarray(y))
            .build()
            .interp_array(qx, qy)
        )
        assert np.abs(cubic - truth).max() < 1e-4
        assert np.abs(cubic - truth).max() < np.abs(lin - truth).max() / 50


def tensor_oracle_bc(x, y, z, qx, qy, bcx, bcy):
    """Sequential per-axis SciPy CubicSpline with per-axis bc_type."""
    g = si.CubicSpline(x, z, axis=0, bc_type=bcx)(qx)
    out = np.empty(qx.shape + z.shape[2:])
    for i in range(qx.shape[0]):
        out[i] = si.CubicSpline(y, g[i], axis=0, bc_type=bcy)(qy[i])
    return out


_SCIPY_BC = {
    "not_a_knot": "not-a-knot",
    "natural": "natural",
    "clamped": "clamped",
    "periodic": "periodic",
}


class TestBicubicBoundaries:
    """VERDICT r2 task 5: per-axis natural/clamped/periodic families."""

    @pytest.mark.parametrize(
        "bcx,bcy",
        [
            ("natural", "natural"),
            ("clamped", "clamped"),
            ("natural", "clamped"),
            ("clamped", "not_a_knot"),
            ("not_a_knot", "natural"),
        ],
    )
    def test_matches_scipy_oracle(self, bcx, bcy):
        x, y, z, rng = fixture(seed=hash((bcx, bcy)) % 1000)
        itp = (
            Interp2D.builder(jnp.asarray(z))
            .x(jnp.asarray(x))
            .y(jnp.asarray(y))
            .strategy(Bicubic().boundary(bcx, bcy).extrapolate(True))
            .build()
        )
        qx = rng.uniform(x[0], x[-1], 300)
        qy = rng.uniform(y[0], y[-1], 300)
        got = np.asarray(itp.interp_array(qx, qy))
        want = tensor_oracle_bc(
            x, y, z, qx, qy, _SCIPY_BC[bcx], _SCIPY_BC[bcy]
        )
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)

    @pytest.mark.parametrize(
        "bcx,bcy", [("periodic", "not_a_knot"), ("periodic", "periodic")]
    )
    def test_periodic_axes(self, bcx, bcy):
        x, y, z, rng = fixture(nx=12, ny=10, seed=7)
        z = z.copy()
        z[-1] = z[0]  # periodic x requires first == last
        if bcy == "periodic":
            z[:, -1] = z[:, 0]
        itp = (
            Interp2D.builder(jnp.asarray(z))
            .x(jnp.asarray(x))
            .y(jnp.asarray(y))
            .strategy(Bicubic().boundary(bcx, bcy))
            .build()
        )
        qx = rng.uniform(x[0], x[-1], 200)
        qy = rng.uniform(y[0], y[-1], 200)
        got = np.asarray(itp.interp_array(qx, qy))
        want = tensor_oracle_bc(
            x, y, z, qx, qy, _SCIPY_BC[bcx], _SCIPY_BC[bcy]
        )
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)
        # queries wrap on the periodic axis: shifting by the period is
        # identity (the 1-D Extrapolate::Periodic contract)
        period = x[-1] - x[0]
        wrapped = np.asarray(itp.interp_array(qx + 2 * period, qy))
        np.testing.assert_allclose(wrapped, got, rtol=1e-4, atol=1e-6)
        # ... while the non-periodic axis still errors OOB
        if bcy != "periodic":
            from ndarray_interp_tpu.errors import OutOfBoundsError

            with pytest.raises(OutOfBoundsError):
                itp.interp_array(
                    np.asarray([x[0] + 0.1]), np.asarray([y[-1] + 1.0])
                )

    def test_periodic_requires_first_equals_last(self):
        from ndarray_interp_tpu.errors import BuilderValueError

        x, y, z, _ = fixture(seed=3)
        with pytest.raises(BuilderValueError):
            (
                Interp2D.builder(jnp.asarray(z))
                .x(jnp.asarray(x))
                .y(jnp.asarray(y))
                .strategy(Bicubic().boundary("periodic", "not_a_knot"))
                .build()
            )

    def test_unknown_kind_rejected(self):
        with pytest.raises(ValueError, match="unknown bicubic boundary"):
            Bicubic().boundary("cubic")

    def test_checkpoint_roundtrip_with_boundaries(self, tmp_path):
        from ndarray_interp_tpu.utils import checkpoint

        x, y, z, rng = fixture(seed=11)
        itp = (
            Interp2D.builder(jnp.asarray(z))
            .x(jnp.asarray(x))
            .y(jnp.asarray(y))
            .strategy(Bicubic().boundary("natural", "clamped"))
            .build()
        )
        p = tmp_path / "bicubic_bc.npz"
        checkpoint.save(p, itp)
        back = checkpoint.load(p)
        assert back.strategy.bc_x == "natural"
        assert back.strategy.bc_y == "clamped"
        qx = rng.uniform(x[0], x[-1], 20)
        qy = rng.uniform(y[0], y[-1], 20)
        np.testing.assert_allclose(
            np.asarray(back.interp_array(qx, qy)),
            np.asarray(itp.interp_array(qx, qy)),
        )


class TestBicubicLayouts:
    """Cell-table (1 gather) vs memory-frugal node-table routes."""

    def test_node_layout_matches_cell(self, monkeypatch):
        from ndarray_interp_tpu import config

        x, y, z, rng = fixture(trailing=(3,), seed=21)
        qx = rng.uniform(x[0] - 1, x[-1] + 1, 300)
        qy = rng.uniform(y[0] - 1, y[-1] + 1, 300)
        cell = build(x, y, z)
        assert cell.strategy.layout == "cell"
        monkeypatch.setattr(config, "bicubic_pack_max_elems", 10)
        node = build(x, y, z)
        assert node.strategy.layout == "node"
        # node table is ~4x data; cell table ~16x (less on tiny grids,
        # where edge cells dominate)
        assert node.strategy.rows.size < cell.strategy.rows.size / 2.5
        np.testing.assert_allclose(
            np.asarray(node.interp_array(qx, qy)),
            np.asarray(cell.interp_array(qx, qy)),
            rtol=1e-9,
            atol=1e-11,
        )

    def test_node_layout_matches_scipy(self, monkeypatch):
        from ndarray_interp_tpu import config

        monkeypatch.setattr(config, "bicubic_pack_max_elems", 10)
        x, y, z, rng = fixture(seed=22)
        itp = build(x, y, z)
        assert itp.strategy.layout == "node"
        qx = rng.uniform(x[0], x[-1], 200)
        qy = rng.uniform(y[0], y[-1], 200)
        np.testing.assert_allclose(
            np.asarray(itp.interp_array(qx, qy)),
            tensor_oracle(x, y, z, qx, qy),
            rtol=1e-10,
            atol=1e-12,
        )

    def test_node_layout_checkpoint_roundtrip(self, monkeypatch, tmp_path):
        from ndarray_interp_tpu import config
        from ndarray_interp_tpu.utils import checkpoint

        monkeypatch.setattr(config, "bicubic_pack_max_elems", 10)
        x, y, z, rng = fixture(seed=23)
        itp = build(x, y, z)
        p = tmp_path / "bicubic_node.npz"
        checkpoint.save(p, itp)
        back = checkpoint.load(p)
        assert back.strategy.layout == "node"
        qx = rng.uniform(x[0], x[-1], 20)
        qy = rng.uniform(y[0], y[-1], 20)
        np.testing.assert_allclose(
            np.asarray(back.interp_array(qx, qy)),
            np.asarray(itp.interp_array(qx, qy)),
        )


def test_legacy_checkpoint_rows_convert(tmp_path):
    """Round-3 review regression: round-2 checkpoints stored (16r+4)
    unscaled rows with endpoint channels; they must convert exactly to
    the pre-scaled 16r layout on load (silently evaluating unscaled
    derivatives as scaled ones was the failure mode)."""
    import json

    from ndarray_interp_tpu.models.strategies.bicubic import (
        _solve_axis0,
        _solve_axis1,
    )
    from ndarray_interp_tpu.utils import checkpoint

    x, y, z, rng = fixture(trailing=(2,), seed=51)
    itp = build(x, y, z)  # current layout, the reference values

    # reconstruct the round-2 row format: raw corner state + endpoints
    xj, yj, zj = jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)
    kx = _solve_axis0(xj, zj, "not_a_knot")
    ky = _solve_axis1(yj, zj, "not_a_knot")
    kxy = _solve_axis1(yj, kx, "not_a_knot")
    nx, ny = z.shape[0], z.shape[1]
    r = z.shape[2]
    blocks = [
        np.stack(
            [g[:-1, :-1], g[:-1, 1:], g[1:, :-1], g[1:, 1:]], axis=2
        ).reshape(nx - 1, ny - 1, 4 * r)
        for g in (np.asarray(zj), np.asarray(kx), np.asarray(ky),
                  np.asarray(kxy))
    ]
    ends = np.stack(
        [
            np.broadcast_to(x[:-1, None], (nx - 1, ny - 1)),
            np.broadcast_to(x[1:, None], (nx - 1, ny - 1)),
            np.broadcast_to(y[None, :-1], (nx - 1, ny - 1)),
            np.broadcast_to(y[None, 1:], (nx - 1, ny - 1)),
        ],
        axis=-1,
    )
    legacy = np.concatenate(blocks + [ends], axis=-1).reshape(
        (nx - 1) * (ny - 1), 16 * r + 4
    )

    p = tmp_path / "legacy_bicubic.npz"
    header = {
        "kind": "interp2d",
        "strategy": "bicubic",
        "strategy_meta": {"extrapolate": True},  # round-2 meta shape
    }
    np.savez(
        p,
        x=x, y=y, data=z,
        strategy_rows=legacy,
        __header__=np.frombuffer(
            json.dumps(header).encode(), dtype=np.uint8
        ),
    )
    back = checkpoint.load(p)
    assert back.strategy.rows.shape[1] == 16 * r
    qx = rng.uniform(x[0], x[-1], 50)
    qy = rng.uniform(y[0], y[-1], 50)
    np.testing.assert_allclose(
        np.asarray(back.interp_array(qx, qy)),
        np.asarray(itp.interp_array(qx, qy)),
        rtol=1e-12,
        atol=1e-12,
    )
