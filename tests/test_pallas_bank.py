"""Fused banked-eval kernel — interpret-mode tests.

Selection rides exact bf16 splits and the polynomial keeps the gather
path's op order; on TPU both paths lower identically (bit-exact, checked
by the TPU validation probes), while on CPU interpret-vs-XLA differ by
FMA contraction only — hence the tight-but-not-zero tolerances here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ndarray_interp_tpu.ops.pallas_bank import (
    _banked_eval_impl,
    _gather_form,
    banked_eval,
    can_use_banked,
)


def make_case(n, bank_shape, nq, seed=0):
    rng = np.random.default_rng(seed)
    data = jnp.asarray(rng.normal(size=(n,) + bank_shape).astype(np.float32))
    a = jnp.asarray(
        rng.normal(size=(n - 1,) + bank_shape).astype(np.float32)
    )
    b = jnp.asarray(
        rng.normal(size=(n - 1,) + bank_shape).astype(np.float32)
    )
    idx = jnp.asarray(rng.integers(0, n - 1, nq).astype(np.int32))
    t = jnp.asarray(rng.uniform(-0.5, 1.5, nq).astype(np.float32))
    return data, a, b, idx, t


@pytest.mark.parametrize(
    "n,bank_shape,nq",
    [
        (16, (300,), 100),
        (255, (520,), 1000),
        (129, (16, 33), 77),
        # direct-read kernel ragged edges: bank % Br != 0 (Mosaic-masked
        # edge blocks), nq % Bq != 0, odd knot counts, tiny query count
        (64, (999,), 513),
        (64, (1300,), 257),
        (33, (256,), 8),
        (65, (300,), 64),
    ],
)
def test_bit_exact_vs_gather_form(n, bank_shape, nq):
    data, a, b, idx, t = make_case(n, bank_shape, nq)
    got = np.asarray(_banked_eval_impl(data, a, b, idx, t, interpret=True))
    want = np.asarray(_gather_form(data, a, b, idx, t))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=2e-6)


def test_nan_t_propagates():
    data, a, b, idx, t = make_case(32, (256,), 64)
    t = t.at[3].set(jnp.nan)
    got = np.asarray(_banked_eval_impl(data, a, b, idx, t, interpret=True))
    assert np.isnan(got[3]).all()
    assert np.isfinite(got[4]).all()


def test_gradients_match_gather_vjp():
    data, a, b, idx, t = make_case(24, (280,), 50)

    def loss_ref(data, a, b, t):
        return jnp.sum(_gather_form(data, a, b, idx, t) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(data, a, b, t)

    import ndarray_interp_tpu.ops.pallas_bank as mod

    orig = mod._banked_eval_impl
    mod._banked_eval_impl = lambda *args, **kw: orig(*args, interpret=True)
    try:
        def loss(data, a, b, t):
            return jnp.sum(banked_eval(data, a, b, idx, t) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(data, a, b, t)
    finally:
        mod._banked_eval_impl = orig
    for got, want in zip(g, g_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )


def test_eligibility():
    x = jnp.linspace(0, 1, 128, dtype=jnp.float32)
    assert can_use_banked(x, jnp.zeros((128, 512), jnp.float32))
    assert not can_use_banked(x, jnp.zeros((128,), jnp.float32))  # 1-D
    assert not can_use_banked(x, jnp.zeros((128, 64), jnp.float32))  # narrow
    assert not can_use_banked(
        x, jnp.zeros((128, 512), jnp.float64)
    )  # dtype
    xb = jnp.linspace(0, 1, 4096, dtype=jnp.float32)
    assert not can_use_banked(xb, jnp.zeros((4096, 512), jnp.float32))
