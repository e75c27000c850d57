"""Partitioning rules that make the Pallas kernels sharding-real.

The reference is single-process (SURVEY.md §2: no distributed anything);
scale-out here is mesh sharding (SURVEY.md §5/§7): queries shard over a
``query`` axis, spline banks over a ``bank`` axis, knot vectors replicate.
XLA can partition the *XLA formulations* of the hot ops automatically, but
a ``pallas_call`` is an opaque custom call — under a mesh GSPMD would have
to replicate it (gathering every shard's queries onto every device).

This module wraps each kernel entry in :func:`custom_partitioning` with the
zero-communication rule the math permits:

* ``fused_eval_1d`` / ``fused_lower_index``: queries and outputs shard over
  the flat query axis; knots and interval tables replicate (they're the
  small per-model state).  Each device runs the unmodified kernel on its
  query shard.
* ``banked_eval``: queries/output-rows shard over the query axis AND the
  bank (trailing) axis of the coefficient tables shards over the bank
  axis; each device evaluates its (query-shard × bank-shard) output block.

``custom_partitioning`` has no batching rule, so each wrapper also carries
a :func:`jax.custom_batching.custom_vmap` rule: a ``vmap`` over queries
flattens into the kernel's query axis (the op is elementwise in queries);
a ``vmap`` that batches the tables falls back to the (vmappable) XLA
formulation, which is bit-identical for the finite tables the kernels are
routed (docs/PARITY.md D5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _spec(shaped):
    sharding = getattr(shaped, "sharding", None)
    spec = getattr(sharding, "spec", None)
    if spec is None:
        return P()
    return spec


# -- fused_eval_1d ------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fused_eval_cp(interpret: bool):
    from .pallas_eval import _fused_eval_impl

    @custom_partitioning
    def cp(knots, tbl, q):
        return _fused_eval_impl(knots, tbl, q, interpret=interpret)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        q_spec = _spec(arg_shapes[2])
        repl = NamedSharding(mesh, P())
        arg_sh = (repl, NamedSharding(mesh, P(None, None)),
                  NamedSharding(mesh, q_spec))

        def lower(knots, tbl, q):
            return _fused_eval_impl(knots, tbl, q, interpret=interpret)

        return mesh, lower, NamedSharding(mesh, q_spec), arg_sh

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        return NamedSharding(mesh, _spec(arg_shapes[2]))

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="n, m c, q -> q",
        need_replication_factors=("n", "m", "c"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def sharded_fused_eval(interpret: bool = False):
    """Sharding- and vmap-compatible wrapper of the fused eval kernel."""
    from .pallas_eval import _eval_xla

    cp = _fused_eval_cp(interpret)

    @jax.custom_batching.custom_vmap
    def f(knots, tbl, q):
        return cp(knots, tbl, q)

    @f.def_vmap
    def _rule(axis_size, in_batched, knots, tbl, q):
        kb, tb, qb = in_batched
        if kb or tb:
            out = jax.vmap(
                _eval_xla,
                in_axes=(0 if kb else None, 0 if tb else None,
                         0 if qb else None),
                axis_size=axis_size,
            )(knots, tbl, q)
            return out, True
        flat = f(knots, tbl, q.reshape(-1))
        return flat.reshape(axis_size, -1), True

    return f


# -- fused_eval_1d_df ---------------------------------------------------------


@functools.lru_cache(maxsize=None)
def sharded_df_eval(interpret: bool = False):
    """custom_partitioning wrapper for the double-float kernel: the ten
    (hi, lo) operands follow the same rule as the f32 kernel — queries
    and both outputs shard over the query axis, tables replicate."""
    from .pallas_eval_df import fused_eval_1d_df

    @custom_partitioning
    def cp(xh, xl, dh, dl, ah, al, bh, bl, qh, ql):
        return fused_eval_1d_df(
            xh, xl, dh, dl, ah, al, bh, bl, qh, ql, interpret=interpret
        )

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        q_spec = _spec(arg_shapes[8])
        repl = NamedSharding(mesh, P())
        q_sh = NamedSharding(mesh, q_spec)
        arg_sh = (repl,) * 8 + (q_sh, q_sh)

        def lower(xh, xl, dh, dl, ah, al, bh, bl, qh, ql):
            return fused_eval_1d_df(
                xh, xl, dh, dl, ah, al, bh, bl, qh, ql, interpret=interpret
            )

        return mesh, lower, (q_sh, q_sh), arg_sh

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        q_sh = NamedSharding(mesh, _spec(arg_shapes[8]))
        return (q_sh, q_sh)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="n, n, n, n, m, m, m, m, q, q -> q, q",
        need_replication_factors=("n", "m"),
    )
    return cp


# -- fused_lower_index --------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _lower_index_cp(interpret: bool):
    from .pallas_eval import fused_lower_index

    @custom_partitioning
    def cp(knots, q):
        return fused_lower_index(knots, q, interpret=interpret)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        q_spec = _spec(arg_shapes[1])
        arg_sh = (NamedSharding(mesh, P()), NamedSharding(mesh, q_spec))

        def lower(knots, q):
            return fused_lower_index(knots, q, interpret=interpret)

        return mesh, lower, NamedSharding(mesh, q_spec), arg_sh

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        return NamedSharding(mesh, _spec(arg_shapes[1]))

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="n, q -> q",
        need_replication_factors=("n",),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _index_frac_cp(interpret: bool):
    from .pallas_eval import _index_frac_impl

    @custom_partitioning
    def cp(knots, q):
        return _index_frac_impl(knots, q, interpret=interpret)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        q_spec = _spec(arg_shapes[1])
        q_sh = NamedSharding(mesh, q_spec)
        arg_sh = (NamedSharding(mesh, P()), q_sh)

        def lower(knots, q):
            return _index_frac_impl(knots, q, interpret=interpret)

        return mesh, lower, (q_sh, q_sh), arg_sh

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        q_sh = NamedSharding(mesh, _spec(arg_shapes[1]))
        return (q_sh, q_sh)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="n, q -> q, q",
        need_replication_factors=("n",),
    )
    return cp


@functools.lru_cache(maxsize=None)
def sharded_index_frac(interpret: bool = False):
    """Sharding- and vmap-compatible wrapper of the fused (idx, t) pass
    (cf. ``sharded_fused_eval`` — same inversion: ``fused_index_frac``'s
    custom_vjp primal routes through this wrapper, so every strategy
    using the one-pass search keeps zero-communication query sharding)."""
    from .searchsorted import get_lower_index

    cp = _index_frac_cp(interpret)

    def _xla_frac(knots, q):
        idx = get_lower_index(knots, q)
        x_l = knots[idx]
        x_r = knots[idx + 1]
        return idx, (q - x_l) / (x_r - x_l)

    @jax.custom_batching.custom_vmap
    def f(knots, q):
        return cp(knots, q)

    @f.def_vmap
    def _rule(axis_size, in_batched, knots, q):
        kb, qb = in_batched
        if kb:
            idx, t = jax.vmap(
                _xla_frac,
                in_axes=(0, 0 if qb else None),
                axis_size=axis_size,
            )(knots, q)
            return (idx, t), (True, True)
        idx, t = f(knots, q.reshape(-1))
        return (
            (idx.reshape(axis_size, -1), t.reshape(axis_size, -1)),
            (True, True),
        )

    return f


@functools.lru_cache(maxsize=None)
def sharded_lower_index(interpret: bool = False):
    from .searchsorted import get_lower_index

    cp = _lower_index_cp(interpret)

    @jax.custom_batching.custom_vmap
    def f(knots, q):
        return cp(knots, q)

    @f.def_vmap
    def _rule(axis_size, in_batched, knots, q):
        kb, qb = in_batched
        if kb:
            out = jax.vmap(
                get_lower_index,
                in_axes=(0, 0 if qb else None),
                axis_size=axis_size,
            )(knots, q)
            return out, True
        flat = f(knots, q.reshape(-1))
        return flat.reshape(axis_size, -1), True

    return f


# -- banked_eval --------------------------------------------------------------


def _gather_form_2d(d2, a2, b2, idx, t):
    """XLA gather formulation on 2-D canonical operands (vmap fallback).

    The single definition lives in ops/pallas_tail.py (it is also the
    custom_vjp backward there): one copy keeps the reference op order in
    sync between the vmap fallback and the backward pass."""
    from .pallas_tail import _gather_form_2d as impl

    return impl(d2, a2, b2, idx, t)


def _bank_query_cp(core):
    """custom_partitioning for ops with the banked signature
    ``(d2 (n, b), a2 (m, b), b2 (m, b), idx (q,), t (q,)) -> (q, b)``:
    the zero-communication query x bank rule shared by the in-VMEM
    banked kernel and the gather route."""

    @custom_partitioning
    def cp(d2, a2, b2, idx, t):
        return core(d2, a2, b2, idx, t)

    def _axes(arg_shapes):
        d_spec = _spec(arg_shapes[0])
        bank_axes = d_spec[1] if len(d_spec) >= 2 else None
        q_spec = _spec(arg_shapes[3])
        q_axes = q_spec[0] if len(q_spec) >= 1 else None
        return bank_axes, q_axes

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        bank_axes, q_axes = _axes(arg_shapes)
        tbl_sh = NamedSharding(mesh, P(None, bank_axes))
        q_sh = NamedSharding(mesh, P(q_axes))

        def lower(d2, a2, b2, idx, t):
            return core(d2, a2, b2, idx, t)

        return (
            mesh,
            lower,
            NamedSharding(mesh, P(q_axes, bank_axes)),
            (tbl_sh, tbl_sh, tbl_sh, q_sh, q_sh),
        )

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        bank_axes, q_axes = _axes(arg_shapes)
        return NamedSharding(mesh, P(q_axes, bank_axes))

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="n b, m b, m b, q, q -> q b",
        need_replication_factors=("n", "m"),
    )
    return cp


def _bank_query_vmap(cp):
    """custom_vmap for the banked signature: batched queries flatten into
    the query axis (broadcasting whichever of idx/t is unbatched);
    table-batched vmaps fall back to the gather formulation."""

    @jax.custom_batching.custom_vmap
    def f(d2, a2, b2, idx, t):
        return cp(d2, a2, b2, idx, t)

    @f.def_vmap
    def _rule(axis_size, in_batched, d2, a2, b2, idx, t):
        db, ab, bb, ib, tb = in_batched
        if db or ab or bb:
            out = jax.vmap(
                _gather_form_2d,
                in_axes=tuple(0 if b else None for b in in_batched),
                axis_size=axis_size,
            )(d2, a2, b2, idx, t)
            return out, True
        # only queries batched: broadcast whichever of (idx, t) is NOT
        # batched so both flatten to axis_size * nq together
        if ib and not tb:
            t = jnp.broadcast_to(t, (axis_size,) + t.shape)
        elif tb and not ib:
            idx = jnp.broadcast_to(idx, (axis_size,) + idx.shape)
        nq = idx.shape[-1]
        flat = f(d2, a2, b2, idx.reshape(-1), t.reshape(-1))
        return flat.reshape((axis_size, nq) + flat.shape[1:]), True

    return f


@functools.lru_cache(maxsize=None)
def sharded_gathered_eval(interpret: bool = False):
    """Sharding- and vmap-compatible gather-route banked evaluation
    (same zero-communication rule as the banked kernel)."""
    from .pallas_tail import _gathered_impl

    return _bank_query_vmap(
        _bank_query_cp(functools.partial(_gathered_impl, interpret=interpret))
    )


@functools.lru_cache(maxsize=None)
def sharded_banked_eval(interpret: bool = False):
    """Sharding- and vmap-compatible banked select+Hermite on 2-D
    canonical operands ``d2 (n, bank), a2/b2 (n-1, bank), idx/t (q,)``."""
    from .pallas_bank import _banked_core

    return _bank_query_vmap(
        _bank_query_cp(functools.partial(_banked_core, interpret=interpret))
    )


# -- DF gather routes (round 3): query-axis rules, tables replicate -----------


def _df_route_cp(core, n_reps, n_qs, rule, factors):
    """custom_partitioning for DF gather routes: ``n_reps`` replicated
    leading operands (knot pairs + the prepacked table), ``n_qs``
    query-sharded flat operands, tuple (hi, lo) outputs sharded over the
    query axis.  Zero communication: every query's row lives in the
    replicated table."""

    @custom_partitioning
    def cp(*args):
        return core(*args)

    def _q_axes(arg_shapes):
        q_spec = _spec(arg_shapes[n_reps])
        return q_spec[0] if len(q_spec) >= 1 else None

    def partition(mesh, arg_shapes, result_shape):
        qa = _q_axes(arg_shapes)
        q_sh = NamedSharding(mesh, P(qa))
        arg_sh = tuple(
            NamedSharding(mesh, P(*([None] * len(arg_shapes[i].shape))))
            for i in range(n_reps)
        ) + (q_sh,) * n_qs
        out_ndim = len(result_shape[0].shape)
        out_sh = NamedSharding(mesh, P(qa, *([None] * (out_ndim - 1))))

        def lower(*args):
            return core(*args)

        return mesh, lower, (out_sh, out_sh), arg_sh

    def infer(mesh, arg_shapes, result_shape):
        qa = _q_axes(arg_shapes)
        out_ndim = len(result_shape[0].shape)
        out_sh = NamedSharding(mesh, P(qa, *([None] * (out_ndim - 1))))
        return (out_sh, out_sh)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=factors,
    )
    return cp


@functools.lru_cache(maxsize=None)
def sharded_df_banked_packed(
    bank: int, interpret: bool = False, tier: str = "df"
):
    """Query-sharded DF banked gather route from a prepacked table.
    ``tier="f48"`` routes through the bf16-lo packed table
    (``pallas_eval_df.gathered_bank_eval_f48_packed``) — identical
    operand/sharding structure, 6bp-channel rows."""
    from .pallas_eval_df import (
        gathered_bank_eval_df_packed,
        gathered_bank_eval_f48_packed,
    )

    route = {
        "df": gathered_bank_eval_df_packed,
        "f48": gathered_bank_eval_f48_packed,
    }[tier]
    return _df_route_cp(
        lambda xh, xl, packed, qh, ql: route(
            xh, xl, packed, bank, qh, ql, interpret=interpret
        ),
        n_reps=3,
        n_qs=2,
        rule="n, n, m c, q, q -> q b, q b",
        factors=("n", "m", "c", "b"),
    )


@functools.lru_cache(maxsize=None)
def sharded_df_bilinear_packed(
    ny: int, r: int, interpret: bool = False, tier: str = "df"
):
    """Query-sharded DF bilinear gather route from a prepacked table.
    ``tier="f48"`` routes through the bf16-lo packed table — identical
    operand/sharding structure, 6bp-channel rows."""
    from .pallas_eval_df import (
        gathered_bilinear_eval_df_packed,
        gathered_bilinear_eval_f48_packed,
    )

    route = {
        "df": gathered_bilinear_eval_df_packed,
        "f48": gathered_bilinear_eval_f48_packed,
    }[tier]
    return _df_route_cp(
        lambda xh, xl, yh, yl, packed, a, b, c, d:
            route(
                xh, xl, yh, yl, packed, ny, r, a, b, c, d,
                interpret=interpret,
            ),
        n_reps=5,
        n_qs=4,
        rule="n, n, p, p, m c, q, q, q, q -> q b, q b",
        factors=("n", "p", "m", "c", "b"),
    )


@functools.lru_cache(maxsize=None)
def sharded_df_bicubic_packed(
    r: int, interpret: bool = False, tier: str = "df"
):
    """Query-sharded DF bicubic gather route from a prepacked table.
    ``tier="f48"`` routes through the bf16-lo packed table
    (``pallas_eval_df.gathered_bicubic_eval_f48_packed``) — identical
    operand/sharding structure, 24bp-channel rows."""
    from .pallas_eval_df import (
        gathered_bicubic_eval_df_packed,
        gathered_bicubic_eval_f48_packed,
    )

    route = {
        "df": gathered_bicubic_eval_df_packed,
        "f48": gathered_bicubic_eval_f48_packed,
    }[tier]
    return _df_route_cp(
        lambda xh, xl, yh, yl, packed, a, b, c, d:
            route(
                xh, xl, yh, yl, packed, a, b, c, d, r=r,
                interpret=interpret,
            ),
        n_reps=5,
        n_qs=4,
        rule="n, n, p, p, m c, q, q, q, q -> q b, q b",
        factors=("n", "p", "m", "c", "b"),
    )


@functools.lru_cache(maxsize=None)
def sharded_df_nd_packed(
    k: int, grid_shape: tuple, r: int, nbasis: int = 4,
    interpret: bool = False, tier: str = "df",
):
    """Query-sharded DF InterpND gather route from a prepacked table
    (``pallas_eval_df_nd.gathered_nd_eval_df_packed``): the k knot-pair
    operands and the table replicate, the 2k flat query operands and
    both (hi, lo) outputs shard over the query axis.  ``tier="f48"``
    expects a ``pack_rows_nd_f48`` table (same operand structure)."""
    from .pallas_eval_df_nd import gathered_nd_eval_df_packed

    core = gathered_nd_eval_df_packed(
        k, grid_shape, r, nbasis=nbasis, interpret=interpret, tier=tier
    )
    letters = ["n", "p", "s", "u", "v", "w"][:k]
    rule = (
        ", ".join(f"{L}, {L}" for L in letters)
        + ", m c, "
        + ", ".join(["q"] * (2 * k))
        + " -> q b, q b"
    )
    return _df_route_cp(
        core,
        n_reps=2 * k + 1,
        n_qs=2 * k,
        rule=rule,
        factors=tuple(letters) + ("m", "c", "b"),
    )


@functools.lru_cache(maxsize=None)
def sharded_df_bicubic_nodes(r: int, interpret: bool = False):
    """Query-sharded DF bicubic NODE route (memory-frugal f64-grade)."""
    from .pallas_eval_df import gathered_bicubic_nodes_eval_df

    return _df_route_cp(
        lambda xh, xl, yh, yl, packed, a, b, c, d:
            gathered_bicubic_nodes_eval_df(
                xh, xl, yh, yl, packed, a, b, c, d, r=r,
                interpret=interpret,
            ),
        n_reps=5,
        n_qs=4,
        rule="n, n, p, p, m c, q, q, q, q -> q b, q b",
        factors=("n", "p", "m", "c", "b"),
    )
