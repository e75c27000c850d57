"""Strategy-protocol tests: Akima, PCHIP, and custom strategies.

Covers BASELINE.json config 4 (Akima + PCHIP via the strategy protocol)
and the port of ``/root/reference/examples/custom_strategy.rs``.
SciPy is the oracle, as in the reference's own cubic tests.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import scipy.interpolate as si

import jax
import jax.numpy as jnp

from ndarray_interp_tpu.errors import NotEnoughDataError, OutOfBoundsError
from ndarray_interp_tpu.interp1d import Akima, Interp1D, Pchip

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def case(n=20, bank=None, seed=5):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 10, n))
    shape = (n,) if bank is None else (n, bank)
    y = rng.normal(size=shape)
    q = np.linspace(x[0], x[-1], 7 * n)
    return x, y, q


class TestAkima:
    def test_matches_scipy(self):
        x, y, q = case()
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Akima())
            .build()
        )
        np.testing.assert_allclose(
            itp.interp_array(q), si.Akima1DInterpolator(x, y)(q), atol=1e-13
        )

    def test_bank_matches_scipy_per_column(self):
        x, y, q = case(bank=7)
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Akima())
            .build()
        )
        got = np.asarray(itp.interp_array(q))
        ref = np.stack(
            [si.Akima1DInterpolator(x, y[:, j])(q) for j in range(7)], -1
        )
        np.testing.assert_allclose(got, ref, atol=1e-13)

    def test_min_points(self):
        with pytest.raises(NotEnoughDataError):
            Interp1D.builder(jnp.asarray([1.0, 2.0])).strategy(Akima()).build()

    def test_oob(self):
        x, y, _ = case()
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Akima())
            .build()
        )
        with pytest.raises(OutOfBoundsError):
            itp.interp(x[0] - 1.0)

    def test_extrapolate(self):
        x, y, _ = case()
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Akima().extrapolate(True))
            .build()
        )
        # end-polynomial extrapolation, same as scipy extrapolate=True
        q = np.array([x[0] - 0.5, x[-1] + 0.5])
        ref = si.Akima1DInterpolator(x, y)(q, extrapolate=True)
        np.testing.assert_allclose(itp.interp_array(q), ref, atol=1e-11)


class TestMakima:
    """Modified Akima — SciPy ``Akima1DInterpolator(method="makima")``
    oracle (MATLAB's makima weights)."""

    def test_matches_scipy(self):
        from ndarray_interp_tpu.interp1d import Makima

        x, y, q = case(seed=9)
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Makima())
            .build()
        )
        ref = si.Akima1DInterpolator(x, y, method="makima")(q)
        np.testing.assert_allclose(itp.interp_array(q), ref, atol=1e-13)

    def test_differs_from_akima_and_damps_flat_ties(self):
        """On data with a flat run, classic Akima's 0/0 tie takes the
        average-slope default while makima's |m_a+m_b|/2 weights pull
        toward the flat side — both pinned against SciPy."""
        from ndarray_interp_tpu.interp1d import Makima

        x = np.arange(10.0)
        y = np.array([0.0, 0, 0, 0, 1, 1, 2, 4, 8, 16])
        q = np.linspace(0, 9, 91)
        mk = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Makima())
            .build()
        )
        ak = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Akima())
            .build()
        )
        ref_mk = si.Akima1DInterpolator(x, y, method="makima")(q)
        ref_ak = si.Akima1DInterpolator(x, y)(q)
        np.testing.assert_allclose(mk.interp_array(q), ref_mk, atol=1e-13)
        np.testing.assert_allclose(ak.interp_array(q), ref_ak, atol=1e-13)
        assert np.abs(ref_mk - ref_ak).max() > 1e-3  # genuinely different

    def test_bank_matches_scipy_per_column(self):
        from ndarray_interp_tpu.interp1d import Makima

        x, y, q = case(seed=10, bank=5)
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Makima())
            .build()
        )
        got = np.asarray(itp.interp_array(q))
        ref = np.stack(
            [
                si.Akima1DInterpolator(x, y[:, j], method="makima")(q)
                for j in range(5)
            ],
            -1,
        )
        np.testing.assert_allclose(got, ref, atol=1e-13)

    def test_extrapolate_and_oob(self):
        from ndarray_interp_tpu.interp1d import Makima

        x, y, _ = case(seed=11)
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Makima())
            .build()
        )
        with pytest.raises(OutOfBoundsError):
            itp.interp(x[0] - 1.0)
        itp_e = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Makima().extrapolate(True))
            .build()
        )
        q = np.array([x[0] - 0.5, x[-1] + 0.5])
        ref = si.Akima1DInterpolator(x, y, method="makima")(
            q, extrapolate=True
        )
        np.testing.assert_allclose(itp_e.interp_array(q), ref, atol=1e-11)


class TestPchip:
    def test_matches_scipy(self):
        x, y, q = case(seed=6)
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Pchip())
            .build()
        )
        np.testing.assert_allclose(
            itp.interp_array(q), si.PchipInterpolator(x, y)(q), atol=1e-13
        )

    def test_monotone_preserving(self):
        rng = np.random.default_rng(9)
        x = np.sort(rng.uniform(0, 10, 25))
        y = np.cumsum(rng.uniform(0, 1, 25))
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Pchip())
            .build()
        )
        q = np.linspace(x[0], x[-1], 500)
        r = np.asarray(itp.interp_array(q))
        assert (np.diff(r) >= -1e-12).all()
        np.testing.assert_allclose(r, si.PchipInterpolator(x, y)(q), atol=1e-13)

    def test_two_points_is_linear(self):
        itp = (
            Interp1D.builder(jnp.asarray([1.0, 3.0]))
            .x(jnp.asarray([0.0, 1.0]))
            .strategy(Pchip())
            .build()
        )
        assert float(itp.interp_scalar(0.5)) == 2.0

    def test_bank_matches_scipy(self):
        x, y, q = case(bank=5, seed=11)
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Pchip())
            .build()
        )
        got = np.asarray(itp.interp_array(q))
        ref = np.stack(
            [si.PchipInterpolator(x, y[:, j])(q) for j in range(5)], -1
        )
        np.testing.assert_allclose(got, ref, atol=1e-13)

    def test_jit_and_grad(self):
        x, y, q = case(seed=3)
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Pchip().extrapolate(True))
            .build()
        )
        f = jax.jit(lambda t, q: t(q))
        np.testing.assert_allclose(
            f(itp, jnp.asarray(q)), itp.interp_array(q), atol=1e-14
        )


class TestCustomStrategy:
    """Port of examples/custom_strategy.rs:56-68 (both formulations)."""

    @pytest.mark.parametrize(
        "cls_name", ["StepInterpolator", "StepInterpolatorBatched"]
    )
    def test_step(self, cls_name):
        import custom_strategy as ex

        cls = getattr(ex, cls_name)
        data = jnp.array([2.0, 4.0, 5.0])
        query = jnp.linspace(-0.5, 2.5, 6)
        interp = Interp1D.builder(data).strategy(cls()).build()
        np.testing.assert_allclose(
            interp.interp_array(query),
            [2.0, 2.0, 4.0, 4.0, 5.0, 5.0],
            atol=1e-15,
        )

    def test_pointwise_and_batched_agree_under_jit(self):
        import custom_strategy as ex

        data = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)))
        q = jnp.linspace(0.0, 9.0, 40)
        r = []
        for cls in (ex.StepInterpolator, ex.StepInterpolatorBatched):
            interp = Interp1D.builder(data).strategy(cls()).build()
            r.append(np.asarray(jax.jit(lambda t, q: t(q))(interp, q)))
        np.testing.assert_array_equal(r[0], r[1])


class TestNearest:
    """First-class step family (the reference's own planned "more
    interpolation strategies"; semantics pinned by SciPy interp1d)."""

    @pytest.mark.parametrize(
        "mode", ["nearest", "nearest-up", "previous", "next"]
    )
    def test_matches_scipy(self, mode):
        from ndarray_interp_tpu.interp1d import Nearest

        x, y, q = case(seed=11)
        # keep queries strictly off midpoints so both tie rules agree
        # with scipy on generic points; ties are pinned separately
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Nearest(mode))
            .build()
        )
        got = np.asarray(itp.interp_array(q))
        ref = si.interp1d(x, y, kind=mode)(q)
        np.testing.assert_allclose(got, ref, atol=0)

    def test_midpoint_ties(self):
        from ndarray_interp_tpu.interp1d import Nearest

        x = np.array([0.0, 1.0, 2.0])
        y = np.array([10.0, 20.0, 30.0])
        mid = np.array([0.5, 1.5])
        down = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Nearest("nearest"))
            .build()
        )
        up = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Nearest("nearest-up"))
            .build()
        )
        np.testing.assert_array_equal(
            np.asarray(down.interp_array(mid)), [10.0, 20.0]
        )
        np.testing.assert_array_equal(
            np.asarray(up.interp_array(mid)), [20.0, 30.0]
        )

    def test_exact_knot_hits(self):
        from ndarray_interp_tpu.interp1d import Nearest

        x = np.array([0.0, 1.0, 2.0, 3.0])
        y = np.array([1.0, 2.0, 3.0, 4.0])
        for mode in ["nearest", "nearest-up", "previous", "next"]:
            itp = (
                Interp1D.builder(jnp.asarray(y))
                .x(jnp.asarray(x))
                .strategy(Nearest(mode))
                .build()
            )
            np.testing.assert_array_equal(
                np.asarray(itp.interp_array(x)), y, err_msg=mode
            )

    def test_oob_and_clamped_extrapolation(self):
        from ndarray_interp_tpu.interp1d import Nearest

        x = np.array([0.0, 1.0, 2.0])
        y = np.array([10.0, 20.0, 30.0])
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Nearest("nearest"))
            .build()
        )
        with pytest.raises(OutOfBoundsError):
            itp.interp(-0.5)
        ex = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Nearest("nearest").extrapolate(True))
            .build()
        )
        np.testing.assert_array_equal(
            np.asarray(ex.interp_array(np.array([-5.0, 7.0]))),
            [10.0, 30.0],
        )

    def test_integer_data_stays_exact(self):
        from ndarray_interp_tpu.interp1d import Nearest

        y = jnp.asarray(np.array([1, 5, 9], np.int32))
        itp = Interp1D.builder(y).strategy(Nearest("previous")).build()
        out = np.asarray(itp.interp_array(np.array([0.9, 1.0, 1.9])))
        np.testing.assert_array_equal(out, [1, 5, 5])

    def test_jit_vmap_and_pytree(self):
        from ndarray_interp_tpu.interp1d import Nearest

        x, y, q = case(seed=13)
        itp = (
            Interp1D.builder(jnp.asarray(y))
            .x(jnp.asarray(x))
            .strategy(Nearest("nearest-up", extrapolate=True))
            .build()
        )
        qj = jnp.asarray(q)
        direct = np.asarray(itp(qj))
        jitted = np.asarray(jax.jit(lambda t, qq: t(qq))(itp, qj))
        np.testing.assert_array_equal(direct, jitted)
        v = jax.vmap(lambda qq: itp(qq))(qj.reshape(4, -1))
        np.testing.assert_array_equal(np.asarray(v).ravel(), direct)


class TestNearest2D:
    def test_matches_scipy_rgi(self):
        from ndarray_interp_tpu.interp2d import Interp2D, Nearest2D

        rng = np.random.default_rng(23)
        x = np.sort(rng.uniform(0, 10, 15))
        y = np.sort(rng.uniform(0, 8, 12))
        z = rng.normal(size=(15, 12, 2))
        itp = (
            Interp2D.builder(jnp.asarray(z))
            .x(jnp.asarray(x))
            .y(jnp.asarray(y))
            .strategy(Nearest2D())
            .build()
        )
        qx = rng.uniform(x[0], x[-1], 400)
        qy = rng.uniform(y[0], y[-1], 400)
        got = np.asarray(itp.interp_array(qx, qy))
        ref = si.RegularGridInterpolator((x, y), z, method="nearest")(
            np.stack([qx, qy], axis=-1)
        )
        np.testing.assert_allclose(got, ref, atol=0)

    def test_grid_node_hits_and_ties(self):
        from ndarray_interp_tpu.interp2d import Interp2D, Nearest2D

        x = np.array([0.0, 1.0, 2.0])
        y = np.array([0.0, 2.0])
        z = np.arange(6.0).reshape(3, 2)
        itp = (
            Interp2D.builder(jnp.asarray(z))
            .x(jnp.asarray(x))
            .y(jnp.asarray(y))
            .strategy(Nearest2D())
            .build()
        )
        # exact node hits
        gx, gy = np.meshgrid(x, y, indexing="ij")
        np.testing.assert_array_equal(
            np.asarray(itp.interp_array(gx.ravel(), gy.ravel())), z.ravel()
        )
        # midpoint ties go LEFT on both axes
        assert float(itp.interp_scalar(0.5, 1.0)) == z[0, 0]

    def test_oob_and_clamped_extrapolation(self):
        from ndarray_interp_tpu.errors import OutOfBoundsError
        from ndarray_interp_tpu.interp2d import Interp2D, Nearest2D

        z = jnp.asarray(np.arange(12.0).reshape(4, 3))
        itp = Interp2D.builder(z).strategy(Nearest2D()).build()
        with pytest.raises(OutOfBoundsError):
            itp.interp(-1.0, 0.0)
        ex = Interp2D.builder(z).strategy(Nearest2D(extrapolate=True)).build()
        assert float(ex.interp_scalar(-5.0, -5.0)) == 0.0
        assert float(ex.interp_scalar(99.0, 99.0)) == 11.0

    def test_jit_matches_eager(self):
        from ndarray_interp_tpu.interp2d import Interp2D, Nearest2D

        rng = np.random.default_rng(27)
        z = jnp.asarray(rng.normal(size=(9, 7)))
        itp = Interp2D.builder(z).strategy(Nearest2D(extrapolate=True)).build()
        qx = jnp.asarray(rng.uniform(0, 8, 50))
        qy = jnp.asarray(rng.uniform(0, 6, 50))
        np.testing.assert_array_equal(
            np.asarray(jax.jit(lambda t, a, b: t(a, b))(itp, qx, qy)),
            np.asarray(itp(qx, qy)),
        )

    def test_integer_grid_stays_exact(self):
        # reference bilinear supports i32 grids (tests/interp2d.rs:26-34);
        # nearest never does arithmetic on values, so i32 survives intact
        from ndarray_interp_tpu.interp2d import Interp2D, Nearest2D

        z = jnp.asarray(np.arange(20, dtype=np.int32).reshape(4, 5) * 7)
        itp = Interp2D.builder(z).strategy(Nearest2D()).build()
        out = np.asarray(itp.interp_array(np.array([0.2, 2.9]), np.array([0.9, 3.8])))
        np.testing.assert_array_equal(out, [7 * 1, 7 * (3 * 5 + 4)])
