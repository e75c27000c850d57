"""Mesh-sharding tests on the 8-virtual-device CPU mesh.

The reference has no distributed layer (SURVEY.md §2: parallelism
inventory); these tests cover the TPU-native scale-out design —
bank-sharded construction and query-sharded evaluation — plus the driver
dry-run entry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ndarray_interp_tpu.interp1d import CubicSpline, Interp1D
from ndarray_interp_tpu.parallel import (
    make_mesh,
    shard_interp1d,
    shard_queries,
    sharded_eval_1d,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def build_bank(n=32, bank=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.linspace(0.0, 1.0, n))
    data = jnp.asarray(rng.normal(size=(n, bank)))
    return (
        Interp1D.builder(data)
        .x(x)
        .strategy(CubicSpline().extrapolate(True))
        .build()
    )


def test_mesh_factorization(mesh):
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "query": 2,
        "bank": 4,
    }
    m1 = make_mesh(8, axis_names=("data",))
    assert m1.devices.shape == (8,)


def test_sharded_eval_matches_replicated(mesh):
    interp = build_bank()
    q = jnp.asarray(np.random.default_rng(1).uniform(0, 1, 64))
    expect = interp.interp_array(q)

    sharded = shard_interp1d(interp, mesh)
    got = sharded_eval_1d(sharded, q, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-14)
    # output is actually sharded over both mesh axes
    assert got.sharding.spec == P("query", "bank")


def test_bank_sharded_build(mesh):
    """Coefficient construction under pjit with the bank axis sharded."""
    rng = np.random.default_rng(2)
    n, bank = 16, 8
    x = jnp.asarray(np.linspace(0.0, 1.0, n))
    data = jax.device_put(
        jnp.asarray(rng.normal(size=(n, bank))),
        NamedSharding(mesh, P(None, "bank")),
    )
    strat = CubicSpline().extrapolate(True)

    @jax.jit
    def build_ab(data):
        s = strat.build(x, data)
        return s.a, s.b

    a, b = build_ab(data)
    # sharding propagates through the scan-based Thomas solve
    assert "bank" in str(a.sharding) or a.sharding.is_fully_replicated is False

    eager = strat.build(x, jax.device_put(data, jax.devices("cpu")[0]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(eager.a), atol=1e-14)
    np.testing.assert_allclose(np.asarray(b), np.asarray(eager.b), atol=1e-14)


def test_shard_queries_roundtrip(mesh):
    q = jnp.arange(32.0)
    qs = shard_queries(q, mesh)
    assert qs.sharding.spec == P("query")
    np.testing.assert_array_equal(np.asarray(qs), np.asarray(q))


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 8)
    assert bool(jnp.isfinite(out).all())
