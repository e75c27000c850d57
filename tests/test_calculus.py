"""derivative()/integrate() — the beyond-reference calculus surface.

Oracle: SciPy (`CubicSpline.derivative/.integrate`,
`Akima1DInterpolator`, `PchipInterpolator` — all CubicHermiteSpline
subclasses).  The reference crate has no analogue; the surface mirrors
SciPy's so its users can switch.  Linear integrate is pinned against
the exact knot-inclusive trapezoid.
"""

import numpy as np
import pytest
import scipy.interpolate as si

import jax
import jax.numpy as jnp

from ndarray_interp_tpu.errors import OutOfBoundsError
from ndarray_interp_tpu.interp1d import (
    Akima,
    CubicSpline,
    Interp1D,
    Linear,
    Makima,
    Nearest,
    Pchip,
)


def case(n=20, bank=None, seed=5):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 10, n))
    shape = (n,) if bank is None else (n, bank)
    y = rng.normal(size=shape)
    q = np.linspace(x[0], x[-1], 7 * n)
    return x, y, q


def build(x, y, strat):
    return (
        Interp1D.builder(jnp.asarray(y))
        .x(jnp.asarray(x))
        .strategy(strat)
        .build()
    )


class TestDerivative:
    @pytest.mark.parametrize(
        "bc", ["not-a-knot", "natural", "clamped", "periodic"]
    )
    def test_cubic_matches_scipy(self, bc):
        from ndarray_interp_tpu.interp1d.cubic_spline import (
            BoundaryCondition,
        )

        x, y, q = case()
        if bc == "periodic":
            y = y.copy()
            y[-1] = y[0]
        bmap = {
            "not-a-knot": BoundaryCondition.NotAKnot,
            "natural": BoundaryCondition.Natural,
            "clamped": BoundaryCondition.Clamped,
            "periodic": BoundaryCondition.Periodic,
        }
        itp = build(x, y, CubicSpline().boundary(bmap[bc]))
        ref = si.CubicSpline(x, y, bc_type=bc).derivative()(q)
        np.testing.assert_allclose(
            itp.derivative(q), ref, rtol=1e-9, atol=1e-10
        )

    @pytest.mark.parametrize(
        "strat,oracle",
        [
            (Akima(), lambda x, y: si.Akima1DInterpolator(x, y)),
            (
                Makima(),
                lambda x, y: si.Akima1DInterpolator(x, y, method="makima"),
            ),
            (Pchip(), lambda x, y: si.PchipInterpolator(x, y)),
        ],
        ids=["akima", "makima", "pchip"],
    )
    def test_hermite_family_matches_scipy(self, strat, oracle):
        x, y, q = case(seed=7)
        itp = build(x, y, strat)
        ref = oracle(x, y).derivative()(q)
        np.testing.assert_allclose(
            itp.derivative(q), ref, rtol=1e-9, atol=1e-11
        )

    def test_linear_slopes(self):
        x, y, _ = case(seed=8)
        itp = build(x, y, Linear())
        mids = 0.5 * (x[:-1] + x[1:])
        want = np.diff(y) / np.diff(x)
        np.testing.assert_allclose(
            itp.derivative(mids), want, rtol=1e-12
        )

    def test_bank_shape_and_values(self):
        x, y, q = case(bank=4, seed=9)
        itp = build(x, y, CubicSpline())
        got = np.asarray(itp.derivative(q))
        assert got.shape == (q.shape[0], 4)
        ref = si.CubicSpline(x, y).derivative()(q)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)

    def test_matches_autodiff(self):
        """jax.grad of the pure eval == the analytic derivative."""
        x, y, q = case(seed=10)
        itp = build(x, y, CubicSpline().extrapolate(True))
        ad = jax.vmap(jax.grad(lambda p: itp(p)))(jnp.asarray(q))
        np.testing.assert_allclose(
            itp.derivative(q), ad, rtol=1e-8, atol=1e-10
        )

    def test_jit_and_query_dims(self):
        x, y, q = case(seed=11)
        itp = build(x, y, CubicSpline())
        f = jax.jit(lambda t, p: t.derivative(p))
        np.testing.assert_allclose(
            f(itp, jnp.asarray(q)), itp.derivative(q), rtol=1e-12
        )
        q2 = q[:20].reshape(4, 5)
        assert itp.derivative(q2).shape == (4, 5)

    def test_oob_raises_unless_extrapolating(self):
        x, y, _ = case(seed=12)
        itp = build(x, y, CubicSpline())
        with pytest.raises(OutOfBoundsError):
            itp.derivative(x[0] - 1.0)
        itp_e = build(x, y, CubicSpline().extrapolate(True))
        ref = si.CubicSpline(x, y).derivative()(x[0] - 1.0)
        np.testing.assert_allclose(
            itp_e.derivative(x[0] - 1.0), ref, rtol=1e-9
        )

    def test_unsupported_strategy(self):
        x, y, _ = case(seed=13)
        with pytest.raises(TypeError, match="does not support"):
            build(x, y, Nearest()).derivative(x[1])

    @pytest.mark.parametrize("order", [2, 3])
    def test_higher_orders_match_scipy(self, order):
        x, y, q = case(seed=23)
        itp = build(x, y, CubicSpline())
        ref = si.CubicSpline(x, y).derivative(order)(q)
        # order-3 is piecewise constant with jumps at the knots; query
        # strictly inside intervals to avoid side-of-knot ambiguity
        qin = 0.5 * (x[:-1] + x[1:])
        refin = si.CubicSpline(x, y).derivative(order)(qin)
        np.testing.assert_allclose(
            itp.derivative(qin, order=order), refin, rtol=1e-8, atol=1e-9
        )
        if order == 2:  # continuous: the full query grid also matches
            np.testing.assert_allclose(
                itp.derivative(q, order=order), ref, rtol=1e-8, atol=1e-9
            )

    def test_order_validation_and_linear_zeros(self):
        x, y, _ = case(seed=24)
        itp = build(x, y, CubicSpline())
        with pytest.raises(ValueError, match="order"):
            itp.derivative(x[1], order=4)
        lin = build(x, y, Linear())
        mids = 0.5 * (x[:-1] + x[1:])
        np.testing.assert_array_equal(
            np.asarray(lin.derivative(mids, order=2)), 0.0
        )


class TestIntegrate:
    @pytest.mark.parametrize(
        "bc", ["not-a-knot", "natural", "clamped", "periodic"]
    )
    def test_cubic_matches_scipy(self, bc):
        from ndarray_interp_tpu.interp1d.cubic_spline import (
            BoundaryCondition,
        )

        x, y, _ = case(seed=14)
        if bc == "periodic":
            y = y.copy()
            y[-1] = y[0]
        bmap = {
            "not-a-knot": BoundaryCondition.NotAKnot,
            "natural": BoundaryCondition.Natural,
            "clamped": BoundaryCondition.Clamped,
            "periodic": BoundaryCondition.Periodic,
        }
        itp = build(x, y, CubicSpline().boundary(bmap[bc]))
        sp = si.CubicSpline(x, y, bc_type=bc)
        for lo, hi in [(x[0], x[-1]), (x[2] + 0.3, x[-3] - 0.2)]:
            np.testing.assert_allclose(
                itp.integrate(lo, hi),
                sp.integrate(lo, hi),
                rtol=1e-9,
                atol=1e-11,
            )

    def test_signed_and_zero_width(self):
        x, y, _ = case(seed=15)
        itp = build(x, y, CubicSpline())
        a, b = x[1] + 0.1, x[-2] - 0.1
        fwd = np.asarray(itp.integrate(a, b))
        np.testing.assert_allclose(
            np.asarray(itp.integrate(b, a)), -fwd, rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(itp.integrate(a, a)), 0.0, atol=1e-14
        )

    def test_periodic_extension(self):
        """Bounds beyond the range integrate the periodic extension —
        SciPy ``integrate(..., extrapolate='periodic')`` oracle."""
        from ndarray_interp_tpu.interp1d.cubic_spline import (
            BoundaryCondition,
        )

        x, y, _ = case(seed=16)
        y = y.copy()
        y[-1] = y[0]
        itp = build(
            x,
            y,
            CubicSpline()
            .extrapolate(True)
            .boundary(BoundaryCondition.Periodic),
        )
        sp = si.CubicSpline(x, y, bc_type="periodic")
        period = x[-1] - x[0]
        lo, hi = x[0] - 1.3 * period, x[-1] + 2.6 * period
        np.testing.assert_allclose(
            itp.integrate(lo, hi),
            sp.integrate(lo, hi, extrapolate="periodic"),
            rtol=1e-9,
            atol=1e-10,
        )

    def test_extrapolated_bounds_match_scipy(self):
        x, y, _ = case(seed=17)
        itp = build(x, y, CubicSpline().extrapolate(True))
        sp = si.CubicSpline(x, y)
        np.testing.assert_allclose(
            itp.integrate(x[0] - 0.7, x[-1] + 0.4),
            sp.integrate(x[0] - 0.7, x[-1] + 0.4),
            rtol=1e-9,
        )

    @pytest.mark.parametrize(
        "strat,oracle",
        [
            (Akima(), lambda x, y: si.Akima1DInterpolator(x, y)),
            (
                Makima(),
                lambda x, y: si.Akima1DInterpolator(x, y, method="makima"),
            ),
            (Pchip(), lambda x, y: si.PchipInterpolator(x, y)),
        ],
        ids=["akima", "makima", "pchip"],
    )
    def test_hermite_family_matches_scipy(self, strat, oracle):
        x, y, _ = case(seed=18)
        itp = build(x, y, strat)
        sp = oracle(x, y)
        lo, hi = x[1] + 0.2, x[-2] + 0.1
        np.testing.assert_allclose(
            itp.integrate(lo, hi), sp.integrate(lo, hi), rtol=1e-9
        )

    def test_linear_exact_trapezoid(self):
        x, y, _ = case(seed=19)
        itp = build(x, y, Linear())
        lo, hi = x[3] + 0.25, x[-4] - 0.5
        # exact oracle: trapezoid over samples that include every knot
        pts = np.unique(
            np.concatenate([[lo], x[(x > lo) & (x < hi)], [hi]])
        )
        vals = np.interp(pts, x, y)
        want = np.trapezoid(vals, pts)
        np.testing.assert_allclose(itp.integrate(lo, hi), want, rtol=1e-12)

    def test_bank_shape(self):
        x, y, _ = case(bank=3, seed=20)
        itp = build(x, y, CubicSpline())
        got = np.asarray(itp.integrate(x[0], x[-1]))
        assert got.shape == (3,)
        ref = si.CubicSpline(x, y).integrate(x[0], x[-1])
        np.testing.assert_allclose(got, ref, rtol=1e-9)

    def test_jit_traced_bounds(self):
        x, y, _ = case(seed=21)
        itp = build(x, y, CubicSpline())
        f = jax.jit(lambda t, a, b: t.integrate(a, b))
        got = f(itp, jnp.asarray(x[0] + 0.5), jnp.asarray(x[-1] - 0.5))
        np.testing.assert_allclose(
            got, itp.integrate(x[0] + 0.5, x[-1] - 0.5), rtol=1e-12
        )

    def test_oob_raises_unless_extrapolating(self):
        x, y, _ = case(seed=22)
        itp = build(x, y, CubicSpline())
        with pytest.raises(OutOfBoundsError):
            itp.integrate(x[0] - 1.0, x[-1])
        with pytest.raises(TypeError, match="does not support"):
            build(x, y, Nearest()).integrate(x[0], x[-1])


def finite(a):
    a = np.asarray(a)
    return a[np.isfinite(a)]


class TestCubicRootsOp:
    """ops/cubicroots.py: the batched closed-form solver vs np.roots."""

    def test_random_cubics_match_numpy(self):
        from ndarray_interp_tpu.ops.cubicroots import real_cubic_roots

        rng = np.random.default_rng(31)
        c = rng.normal(size=(200, 4))
        got = np.asarray(
            real_cubic_roots(
                jnp.asarray(c[:, 0]),
                jnp.asarray(c[:, 1]),
                jnp.asarray(c[:, 2]),
                jnp.asarray(c[:, 3]),
            )
        )
        for i in range(200):
            want = np.roots(c[i, ::-1])
            want = np.sort(want[np.abs(want.imag) < 1e-9].real)
            mine = np.sort(finite(got[i]))
            assert mine.shape == want.shape, (i, mine, want)
            if want.size:
                np.testing.assert_allclose(mine, want, rtol=1e-7, atol=1e-9)

    @pytest.mark.parametrize(
        "coef,want",
        [
            ((6.0, -5.0, 1.0, 0.0), [2.0, 3.0]),  # quadratic
            ((-4.0, 0.0, 1.0, 0.0), [-2.0, 2.0]),  # quadratic, c1 == 0
            ((1.0, 1.0, 1.0, 0.0), []),  # complex pair
            ((3.0, -1.5, 0.0, 0.0), [2.0]),  # linear
            ((2.0, 0.0, 0.0, 0.0), []),  # constant nonzero
            ((0.0, 0.0, 0.0, 0.0), []),  # identically zero: caller's call
            ((0.0, 0.0, 0.0, 1.0), [0.0, 0.0, 0.0]),  # triple root
            ((-1.0, 0.0, 0.0, 1.0), [1.0]),  # p == 0 Cardano branch
        ],
    )
    def test_degenerate_forms(self, coef, want):
        from ndarray_interp_tpu.ops.cubicroots import real_cubic_roots

        got = finite(real_cubic_roots(*map(jnp.float64, coef)))
        np.testing.assert_allclose(
            np.sort(got), np.asarray(want), rtol=1e-12, atol=1e-12
        )


class TestSolve:
    @pytest.mark.parametrize(
        "bc", ["not-a-knot", "natural", "clamped", "periodic"]
    )
    @pytest.mark.parametrize("level", [0.0, 0.3, -0.5])
    def test_cubic_matches_scipy(self, bc, level):
        from ndarray_interp_tpu.interp1d.cubic_spline import (
            BoundaryCondition,
        )

        x, y, _ = case(seed=32)
        if bc == "periodic":
            y = y.copy()
            y[-1] = y[0]
        bmap = {
            "not-a-knot": BoundaryCondition.NotAKnot,
            "natural": BoundaryCondition.Natural,
            "clamped": BoundaryCondition.Clamped,
            "periodic": BoundaryCondition.Periodic,
        }
        itp = build(x, y, CubicSpline().boundary(bmap[bc]))
        got = finite(itp.solve(level))
        want = np.sort(si.CubicSpline(x, y, bc_type=bc).solve(
            level, extrapolate=False
        ))
        assert got.shape == want.shape, (got, want)
        # near-tangent roots amplify coefficient rounding: compare the
        # root *values* through the spline instead of demanding tight x
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)

    def test_extrapolating_edge_roots(self):
        x, y, _ = case(seed=33)
        itp = build(x, y, CubicSpline(extrapolate=True))
        got = finite(itp.solve(0.25))
        want = np.sort(
            si.CubicSpline(x, y).solve(0.25, extrapolate=True)
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)

    @pytest.mark.parametrize(
        "strat,oracle",
        [
            (Akima(), lambda x, y: si.Akima1DInterpolator(x, y)),
            (
                Makima(),
                lambda x, y: si.Akima1DInterpolator(x, y, method="makima"),
            ),
            (Pchip(), lambda x, y: si.PchipInterpolator(x, y)),
        ],
        ids=["akima", "makima", "pchip"],
    )
    def test_hermite_family_roots(self, strat, oracle):
        x, y, _ = case(seed=34)
        itp = build(x, y, strat)
        got = finite(itp.roots())
        want = np.sort(oracle(x, y).solve(0.0, extrapolate=False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)

    def test_linear_crossings(self):
        x, y, _ = case(seed=35)
        itp = build(x, y, Linear())
        got = finite(itp.roots())
        pp = si.PPoly(
            np.stack([np.diff(y) / np.diff(x), y[:-1]]), x
        )
        want = np.sort(pp.solve(0.0, extrapolate=False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)

    def test_banked_per_column(self):
        x, y, _ = case(bank=4, seed=36)
        itp = build(x, y, CubicSpline())
        got = np.asarray(itp.roots())
        assert got.shape == (3 * (x.size - 1), 4)
        for j in range(4):
            want = np.sort(
                si.CubicSpline(x, y[:, j]).solve(0.0, extrapolate=False)
            )
            col = finite(got[:, j])
            assert col.shape == want.shape, j
            np.testing.assert_allclose(col, want, rtol=1e-7, atol=1e-8)

    def test_per_column_levels_broadcast(self):
        x, y, _ = case(bank=3, seed=37)
        itp = build(x, y, CubicSpline())
        lv = np.asarray([0.1, -0.2, 0.4])
        got = np.asarray(itp.solve(jnp.asarray(lv)))
        for j in range(3):
            want = np.sort(
                si.CubicSpline(x, y[:, j]).solve(lv[j], extrapolate=False)
            )
            np.testing.assert_allclose(
                finite(got[:, j]), want, rtol=1e-7, atol=1e-8
            )

    def test_sorted_nan_padded_and_trim(self):
        x, y, _ = case(seed=38)
        itp = build(x, y, CubicSpline())
        r = np.asarray(itp.roots())
        k = np.isfinite(r).sum()
        assert np.all(np.isnan(r[k:])) and np.all(np.diff(r[:k]) > 0)
        t = np.asarray(itp.roots(max_roots=2))
        assert t.shape == (2,)
        np.testing.assert_array_equal(t, r[:2])

    def test_no_roots_all_nan(self):
        x, y, _ = case(seed=39)
        itp = build(x, y + 100.0, CubicSpline())
        assert np.all(np.isnan(np.asarray(itp.roots())))

    def test_constant_segment_representative_root(self):
        x = np.arange(6.0)
        y = np.asarray([1.0, -1.0, 0.0, 0.0, 0.0, 2.0])
        itp = build(x, y, Linear())
        got = finite(itp.roots())
        # crossing in [0,1] at 0.5; the flat run [2,4] reports its left
        # knots as representative roots (one per identically-zero
        # segment); 4.0 is the genuine zero at the start of the rising
        # [4,5] segment
        np.testing.assert_allclose(got, [0.5, 2.0, 3.0, 4.0], atol=1e-12)

    def test_root_at_knot_reported_once(self):
        x = np.arange(7.0)
        y = np.asarray([2.0, 1.0, 0.0, -1.0, -2.0, -1.5, 3.0])
        itp = build(x, y, Linear())
        got = finite(itp.roots())
        want = np.sort(
            si.PPoly(
                np.stack([np.diff(y) / np.diff(x), y[:-1]]), x
            ).solve(0.0, extrapolate=False)
        )
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_jit_and_vmap(self):
        x, y, _ = case(seed=40)
        itp = build(x, y, CubicSpline())
        eager = np.asarray(itp.roots())
        jitted = np.asarray(jax.jit(lambda t: t.roots())(itp))
        np.testing.assert_allclose(jitted, eager, rtol=1e-12, equal_nan=True)
        lv = jnp.asarray([0.0, 0.1, 0.2])
        vm = np.asarray(jax.vmap(lambda l: itp.solve(l))(lv))
        for i, l in enumerate(np.asarray(lv)):
            np.testing.assert_allclose(
                vm[i], np.asarray(itp.solve(float(l))),
                rtol=1e-12, equal_nan=True,
            )

    def test_solutions_evaluate_to_level(self):
        """Every reported root actually satisfies spline(r) ≈ y."""
        x, y, _ = case(n=40, seed=41)
        itp = build(x, y, CubicSpline())
        r = finite(itp.solve(0.2))
        vals = np.asarray(itp.interp_array(jnp.asarray(r)))
        np.testing.assert_allclose(vals, 0.2, atol=1e-9)

    def test_unsupported_strategy(self):
        x, y, _ = case(seed=42)
        with pytest.raises(TypeError, match="does not support"):
            build(x, y, Nearest()).solve(0.0)


class TestDerivative2D:
    """Interp2D.derivative(xs, ys, dx, dy) — SciPy
    RectBivariateSpline.ev-style partials; oracle = sequential 1-D
    CubicSplines (the tensor-product construction commutes axis-wise
    because the spline solve is linear in its nodal values)."""

    @staticmethod
    def grid(nx=12, ny=10, bank=None, seed=50):
        rng = np.random.default_rng(seed)
        x = np.sort(rng.uniform(0, 5, nx))
        y = np.sort(rng.uniform(0, 4, ny))
        shape = (nx, ny) if bank is None else (nx, ny, bank)
        z = rng.normal(size=shape)
        qx = rng.uniform(x[0], x[-1], 60)
        qy = rng.uniform(y[0], y[-1], 60)
        return x, y, z, qx, qy

    @staticmethod
    def build2(x, y, z, strat):
        from ndarray_interp_tpu.interp2d import Interp2D

        return (
            Interp2D.builder(jnp.asarray(z))
            .x(jnp.asarray(x))
            .y(jnp.asarray(y))
            .strategy(strat)
            .build()
        )

    @staticmethod
    def seq_oracle(x, y, z, qx, qy, ox, oy, bc="not-a-knot"):
        out = np.empty(qx.shape[0])
        for q in range(qx.shape[0]):
            col = np.array(
                [
                    si.CubicSpline(y, z[i], bc_type=bc).derivative(oy)(qy[q])
                    if oy
                    else si.CubicSpline(y, z[i], bc_type=bc)(qy[q])
                    for i in range(x.shape[0])
                ]
            )
            cs = si.CubicSpline(x, col, bc_type=bc)
            out[q] = cs.derivative(ox)(qx[q]) if ox else cs(qx[q])
        return out

    @pytest.mark.parametrize(
        "ox,oy",
        [(1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (2, 2), (3, 1)],
    )
    def test_bicubic_matches_sequential_scipy(self, ox, oy):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, qx, qy = self.grid()
        itp = self.build2(x, y, z, Bicubic())
        got = np.asarray(itp.derivative(qx, qy, dx=ox, dy=oy))
        want = self.seq_oracle(x, y, z, qx, qy, ox, oy)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)

    @pytest.mark.parametrize("bc", ["natural", "clamped", "periodic"])
    def test_boundary_families(self, bc):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, qx, qy = self.grid(seed=51)
        if bc == "periodic":
            z = z.copy()
            z[-1, :] = z[0, :]
            z[:, -1] = z[:, 0]
        itp = self.build2(
            x, y, z, Bicubic(bc_x=bc.replace("-", "_"), bc_y=bc.replace("-", "_"))
        )
        got = np.asarray(itp.derivative(qx, qy, dx=1, dy=1))
        want = self.seq_oracle(x, y, z, qx, qy, 1, 1, bc=bc)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)

    def test_node_layout_matches_cell(self, monkeypatch):
        from ndarray_interp_tpu import config
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, qx, qy = self.grid(seed=52)
        cell = self.build2(x, y, z, Bicubic())
        assert cell.strategy.layout == "cell"
        monkeypatch.setattr(config, "bicubic_pack_max_elems", 10)
        node = self.build2(x, y, z, Bicubic())
        assert node.strategy.layout == "node"
        for ox, oy in [(1, 0), (0, 1), (1, 1), (2, 1)]:
            np.testing.assert_allclose(
                np.asarray(node.derivative(qx, qy, dx=ox, dy=oy)),
                np.asarray(cell.derivative(qx, qy, dx=ox, dy=oy)),
                rtol=1e-11,
                atol=1e-12,
            )

    def test_banked_trailing_dims(self):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, qx, qy = self.grid(bank=3, seed=53)
        itp = self.build2(x, y, z, Bicubic())
        got = np.asarray(itp.derivative(qx, qy, dx=1, dy=0))
        assert got.shape == (60, 3)
        for j in range(3):
            want = self.seq_oracle(x, y, z[..., j], qx, qy, 1, 0)
            np.testing.assert_allclose(
                got[:, j], want, rtol=1e-9, atol=1e-10
            )

    def test_matches_autodiff(self):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, qx, qy = self.grid(seed=54)
        itp = self.build2(x, y, z, Bicubic(extrapolate=True))
        gx = jax.vmap(jax.grad(lambda a, b: itp(a, b), argnums=0))(
            jnp.asarray(qx), jnp.asarray(qy)
        )
        gy = jax.vmap(jax.grad(lambda a, b: itp(a, b), argnums=1))(
            jnp.asarray(qx), jnp.asarray(qy)
        )
        np.testing.assert_allclose(
            np.asarray(itp.derivative(qx, qy, dx=1)), gx,
            rtol=1e-8, atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(itp.derivative(qx, qy, dy=1)), gy,
            rtol=1e-8, atol=1e-10,
        )

    def test_bilinear_partials(self):
        from ndarray_interp_tpu.interp2d import Bilinear

        x, y, z, qx, qy = self.grid(seed=55)
        itp = self.build2(x, y, z, Bilinear())
        gx = jax.vmap(jax.grad(lambda a, b: itp(a, b), argnums=0))(
            jnp.asarray(qx), jnp.asarray(qy)
        )
        gy = jax.vmap(jax.grad(lambda a, b: itp(a, b), argnums=1))(
            jnp.asarray(qx), jnp.asarray(qy)
        )
        np.testing.assert_allclose(
            np.asarray(itp.derivative(qx, qy, dx=1)), gx, rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(itp.derivative(qx, qy, dy=1)), gy, rtol=1e-12
        )
        # the twist term: FD of d/dx across y
        eps = 1e-7
        fd = (
            np.asarray(itp.derivative(qx, qy + eps, dx=1))
            - np.asarray(itp.derivative(qx, qy, dx=1))
        ) / eps
        np.testing.assert_allclose(
            np.asarray(itp.derivative(qx, qy, dx=1, dy=1)), fd,
            rtol=1e-5, atol=1e-6,
        )
        assert np.all(np.asarray(itp.derivative(qx, qy, dx=2)) == 0.0)

    def test_jit_query_dims_and_value_parity(self):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, qx, qy = self.grid(seed=56)
        itp = self.build2(x, y, z, Bicubic())
        f = jax.jit(lambda t, a, b: t.derivative(a, b, dx=1, dy=1))
        np.testing.assert_allclose(
            f(itp, jnp.asarray(qx), jnp.asarray(qy)),
            itp.derivative(qx, qy, dx=1, dy=1),
            rtol=1e-12,
        )
        q2x, q2y = qx[:12].reshape(3, 4), qy[:12].reshape(3, 4)
        assert itp.derivative(q2x, q2y, dx=1).shape == (3, 4)
        # order (0,0) is the surface itself
        np.testing.assert_allclose(
            np.asarray(itp.derivative(qx, qy)),
            np.asarray(itp.interp_array(jnp.asarray(qx), jnp.asarray(qy))),
            rtol=1e-12,
        )

    def test_validation(self):
        from ndarray_interp_tpu.interp2d import Bicubic, Interp2D

        x, y, z, qx, qy = self.grid(seed=57)
        itp = self.build2(x, y, z, Bicubic())
        with pytest.raises(ValueError, match="do not match"):
            itp.derivative(qx, qy[:5], dx=1)
        with pytest.raises(ValueError, match="orders"):
            itp.derivative(qx, qy, dx=4)
        with pytest.raises(OutOfBoundsError):
            itp.derivative(qx - 100.0, qy, dx=1)
        from ndarray_interp_tpu.interp2d import Nearest2D

        nn = self.build2(x, y, z, Nearest2D())
        with pytest.raises(TypeError, match="does not support"):
            nn.derivative(qx, qy, dx=1)

    def test_periodic_wrap_queries(self):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, qx, qy = self.grid(seed=58)
        z = z.copy()
        z[-1, :] = z[0, :]
        z[:, -1] = z[:, 0]
        itp = self.build2(x, y, z, Bicubic(bc_x="periodic", bc_y="periodic"))
        px = x[-1] - x[0]
        py = y[-1] - y[0]
        base = np.asarray(itp.derivative(qx, qy, dx=1, dy=1))
        wrapped = np.asarray(
            itp.derivative(qx + 2 * px, qy - 3 * py, dx=1, dy=1)
        )
        np.testing.assert_allclose(wrapped, base, rtol=1e-8, atol=1e-10)


class TestIntegrate2D:
    """Interp2D.integrate(xlo, xhi, ylo, yhi) — SciPy
    RectBivariateSpline.integral-style box quadrature; oracle =
    sequential 1-D CubicSpline.integrate (the tensor-product
    construction commutes axis-wise because the spline solve is linear
    in its nodal values)."""

    grid = staticmethod(TestDerivative2D.grid)
    build2 = staticmethod(TestDerivative2D.build2)

    @staticmethod
    def seq_integral(x, y, z, xlo, xhi, ylo, yhi, bc="not-a-knot"):
        col = np.array(
            [
                si.CubicSpline(y, z[i], bc_type=bc).integrate(ylo, yhi)
                for i in range(x.shape[0])
            ]
        )
        return si.CubicSpline(x, col, bc_type=bc).integrate(xlo, xhi)

    def test_bicubic_matches_sequential_scipy(self):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, _, _ = self.grid(seed=60)
        itp = self.build2(x, y, z, Bicubic())
        box = (x[2] + 0.17, x[-2] - 0.31, y[1] + 0.05, y[-3] + 0.4)
        got = float(itp.integrate(*box))
        want = self.seq_integral(x, y, z, *box)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-11)

    def test_bilinear_matches_trapezoid(self):
        from ndarray_interp_tpu.interp2d import Bilinear

        x, y, z, _, _ = self.grid(seed=61)
        itp = self.build2(x, y, z, Bilinear())
        # knot-aligned box: bilinear integral == 2-D trapezoid rule
        got = float(itp.integrate(x[1], x[-2], y[2], y[-1]))
        want = np.trapezoid(
            np.trapezoid(z[1:-1, 2:], y[2:], axis=1), x[1:-1]
        )
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_bilinear_exact_on_plane(self):
        from ndarray_interp_tpu.interp2d import Bilinear

        x = np.array([0.0, 1.0, 3.0])
        y = np.array([0.0, 2.0, 5.0])
        z = 2.0 * x[:, None] + 3.0 * y[None, :] + 1.0
        itp = self.build2(x, y, z, Bilinear())
        # ∫∫ (2x+3y+1) over [0.5,2.5]x[1.0,4.0] = 2*3*Ey... do it exactly
        xlo, xhi, ylo, yhi = 0.5, 2.5, 1.0, 4.0
        want = (
            2.0 * (xhi**2 - xlo**2) / 2 * (yhi - ylo)
            + 3.0 * (yhi**2 - ylo**2) / 2 * (xhi - xlo)
            + 1.0 * (xhi - xlo) * (yhi - ylo)
        )
        np.testing.assert_allclose(float(itp.integrate(xlo, xhi, ylo, yhi)), want, rtol=1e-12)

    def test_signed_bounds(self):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, _, _ = self.grid(seed=62)
        itp = self.build2(x, y, z, Bicubic())
        a = float(itp.integrate(x[1], x[-2], y[1], y[-2]))
        np.testing.assert_allclose(
            float(itp.integrate(x[-2], x[1], y[1], y[-2])), -a, rtol=1e-12
        )
        np.testing.assert_allclose(
            float(itp.integrate(x[-2], x[1], y[-2], y[1])), a, rtol=1e-12
        )
        assert float(itp.integrate(x[1], x[1], y[1], y[-2])) == 0.0

    def test_trailing_dims(self):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, _, _ = self.grid(bank=3, seed=63)
        itp = self.build2(x, y, z, Bicubic())
        box = (x[1] + 0.1, x[-2], y[0] + 0.2, y[-1] - 0.3)
        got = np.asarray(itp.integrate(*box))
        assert got.shape == (3,)
        for j in range(3):
            want = self.seq_integral(x, y, z[..., j], *box)
            np.testing.assert_allclose(got[j], want, rtol=1e-10, atol=1e-11)

    def test_extrapolated_and_oob(self):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, _, _ = self.grid(seed=64)
        itp = self.build2(x, y, z, Bicubic())
        with pytest.raises(OutOfBoundsError):
            itp.integrate(x[0] - 1.0, x[-1], y[0], y[-1])
        ext = self.build2(x, y, z, Bicubic(extrapolate=True))
        box = (x[0] - 0.5, x[-1] + 0.25, y[0] - 0.1, y[-1])
        got = float(ext.integrate(*box))
        # oracle: SciPy CubicSpline extrapolates its edge polynomials too
        want = self.seq_integral(x, y, z, *box)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)

    def test_periodic_rejected(self):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, _, _ = self.grid(seed=65)
        z = z.copy()
        z[-1, :] = z[0, :]
        itp = self.build2(x, y, z, Bicubic(bc_x="periodic"))
        with pytest.raises(ValueError, match="periodic"):
            itp.integrate(x[1], x[-2], y[1], y[-2])

    def test_jit_traced_bounds(self):
        from ndarray_interp_tpu.interp2d import Bicubic

        x, y, z, _, _ = self.grid(seed=66)
        itp = self.build2(x, y, z, Bicubic())
        f = jax.jit(lambda a, b, c, d: itp.integrate(a, b, c, d))
        box = (x[1] + 0.3, x[-2] - 0.2, y[1] + 0.1, y[-2])
        np.testing.assert_allclose(
            float(f(*map(jnp.asarray, box))),
            float(itp.integrate(*box)),
            rtol=1e-12,
        )

    def test_integer_grid_promotes(self):
        # regression: int grids crashed in jnp.finfo via truncation
        from ndarray_interp_tpu.interp2d import Interp2D

        itp = Interp2D.builder(np.arange(12).reshape(3, 4)).build()
        got = float(itp.integrate(0.5, 1.5, 0.5, 2.5))
        z = np.arange(12, dtype=np.float64).reshape(3, 4)
        xs = np.linspace(0.5, 1.5, 201)
        ys = np.linspace(0.5, 2.5, 201)
        from scipy.interpolate import RegularGridInterpolator

        rgi = RegularGridInterpolator(
            (np.arange(3.0), np.arange(4.0)), z, method="linear"
        )
        xg, yg = np.meshgrid(xs, ys, indexing="ij")
        samples = rgi(np.stack([xg.ravel(), yg.ravel()], -1)).reshape(xg.shape)
        want = np.trapezoid(np.trapezoid(samples, ys, axis=1), xs)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_unsupported_strategy(self):
        from ndarray_interp_tpu.interp2d import Nearest2D

        x, y, z, _, _ = self.grid(seed=67)
        itp = self.build2(x, y, z, Nearest2D())
        with pytest.raises(TypeError, match="does not support"):
            itp.integrate(x[1], x[2], y[1], y[2])
