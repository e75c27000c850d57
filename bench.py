"""Headline benchmark: 1-D cubic-spline query throughput per chip.

Mirrors BASELINE.json: ``queries/sec/chip (1D cubic, 1M pts)`` on a
2k-knot spline, with the CPU baseline measured live via SciPy's
``CubicSpline`` (the reference crate treats SciPy as its numerical oracle,
and the Rust toolchain is not available in this image to run its criterion
benches directly).

Prints exactly ONE JSON line:
``{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_ROOT = str(_Path(__file__).resolve().parent)
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

import numpy as np


def measure(fn, *args, reps=10, warmup=2):
    """Steady-state wall time per call: ``reps`` back-to-back dispatches
    drained once at the end.

    ``fn`` must return something reducible to a host scalar; fetching it
    drains the dispatch queue.  (On the tunneled TPU backend,
    ``block_until_ready`` returns without waiting, so fetch-based draining
    is the only honest clock; draining once per batch keeps the tunnel's
    ~25 ms round-trip latency out of the per-call number, which is the
    right accounting for a throughput metric.)

    For device-side workloads prefer :func:`measure_chained`: even one
    drain per ``reps`` dispatches leaves ~RTT/reps of tunnel latency in
    each number (~2.5 ms at reps=10), which dwarfs sub-millisecond
    kernels.
    """
    for _ in range(warmup):
        r = fn(*args)
    _drain(r)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        _drain(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return float(best)


def measure_chained(make_chain, links, *args, reps=6, warmup=1):
    """Sustained on-device time per workload iteration.

    ``make_chain(links)`` must return a jitted function running ``links``
    data-dependent iterations of the workload inside ONE device program
    and reducing to a scalar.  This is how a production serving/training
    loop runs — back-to-back batches with no host round-trip per batch —
    and it keeps the relay tunnel's per-dispatch latency (~25 ms RTT,
    not present on directly-attached TPUs) out of the per-iteration
    number.  Returns seconds per iteration.
    """
    fn = make_chain(links)
    return measure(fn, *args, reps=reps, warmup=warmup) / links


def _drain(x):
    # fetching a scalar result drains the queue cheaply (~10 us once idle)
    if hasattr(x, "block_until_ready"):
        float(x)


def _probe_accelerator(timeout=120):
    """True iff a child process can init a non-CPU jax backend in time."""
    import os
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.default_backend() != 'cpu', "
             "jax.default_backend(); jax.devices()"],
            env=dict(os.environ),
            capture_output=True,
            timeout=timeout,
            check=True,
        )
        del out
        return True
    except Exception:
        return False


def _supervise():
    """Run the measurement in a watchdogged child.

    The tunneled TPU backend can wedge indefinitely (hung RPCs are not
    interruptible in-process); a child + timeout guarantees this script
    always prints its JSON line.

    Outage policy (round-3 postmortem: a transient relay wedge at
    snapshot time turned a ~100x TPU record into a 0.6x CPU-fallback
    record): the accelerator is retried with backoff across a long
    window — probe every ~2.5 min for up to ~35 min — before falling
    back to the CPU backend, and any fallback record carries a loud
    top-level ``"degraded": true`` so the pipeline can't mistake an
    outage artifact for a measurement.  Tunable via
    ``NDI_BENCH_RETRY_WINDOW_S`` / ``NDI_BENCH_RETRY_INTERVAL_S``.
    """
    import os
    import subprocess

    here = Path(__file__).resolve()
    env = dict(os.environ)
    env["NDI_BENCH_CHILD"] = "1"
    window_s = float(os.environ.get("NDI_BENCH_RETRY_WINDOW_S", 2100))
    interval_s = float(os.environ.get("NDI_BENCH_RETRY_INTERVAL_S", 150))
    deadline = time.monotonic() + window_s
    attempts = 0
    first = True
    while first or time.monotonic() < deadline:
        first = False
        # quick reachability probe first: a wedged relay hangs device
        # init at ~0% CPU indefinitely (seen live in round 3) — don't
        # burn the full accelerator timeout on a dead tunnel
        if _probe_accelerator():
            attempts += 1
            try:
                out = subprocess.run(
                    [sys.executable, str(here)],
                    env=env,
                    capture_output=True,
                    text=True,
                    timeout=900,
                )
                for line in out.stdout.splitlines():
                    if line.startswith("{"):
                        print(line)
                        return 0
                sys.stderr.write(out.stderr[-2000:])
            except subprocess.TimeoutExpired:
                sys.stderr.write(
                    "bench.py: accelerator run timed out (attempt %d)\n"
                    % attempts
                )
        else:
            sys.stderr.write("bench.py: accelerator unreachable; retrying\n")
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        time.sleep(min(interval_s, max(remaining, 0)))
    # fallback: CPU backend, no relay plugin, scaled-down workload
    # (NDI_BENCH_CPU_FALLBACK trims links/reps — the full chained
    # workload exceeds 900 s on a 1-vCPU host).  The record is marked
    # degraded: it witnesses the library working, not TPU performance.
    env["JAX_PLATFORMS"] = "cpu"
    env["NDI_BENCH_CPU_FALLBACK"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        out = subprocess.run(
            [sys.executable, str(here)],
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                rec["degraded"] = True
                print(json.dumps(rec))
                return 0
        sys.stderr.write(out.stderr[-2000:])
    except subprocess.TimeoutExpired:
        pass
    # last resort: the driver expects exactly one JSON line — emit an
    # honest failure record rather than nothing
    print(json.dumps({
        "metric": "queries/sec/chip (1D cubic, 1M pts)",
        "value": 0.0,
        "unit": "queries/s",
        "vs_baseline": 0.0,
        "degraded": True,
        "extra": {"error": "accelerator unreachable across retry window; "
                           "cpu fallback failed/timed out"},
    }))
    return 1


def main():
    import os

    n_knots = 2048
    n_q = 1_000_000
    # CPU-fallback mode (accelerator unreachable): same workloads, fewer
    # chained links/reps so the run fits the watchdog on a 1-vCPU host
    cheap = bool(os.environ.get("NDI_BENCH_CPU_FALLBACK"))

    rng = np.random.default_rng(42)
    knots = np.linspace(0.0, 100.0, n_knots)
    values = rng.normal(size=n_knots)
    queries = rng.uniform(0.0, 100.0, n_q)

    # --- CPU baseline: SciPy CubicSpline evaluation -----------------------
    # The oracle runs on a 1-vCPU host whose wall clock wobbles +-10% with
    # background load; a single-shot measurement made vs_baseline swing
    # 107 -> 119 within one round (VERDICT r4 weak #2).  Take the median of
    # >=3 independent measurements and record every run in ``extra``.
    import scipy.interpolate as si

    cs = si.CubicSpline(knots, values, bc_type="not-a-knot")
    scipy_runs = [
        n_q / measure(
            lambda q: cs(q).sum(), queries, reps=2 if cheap else 5, warmup=1
        )
        for _ in range(3)
    ]
    scipy_qps = float(np.median(scipy_runs))

    # --- TPU (or default-backend) measurement -----------------------------
    import jax
    import jax.numpy as jnp

    from ndarray_interp_tpu.interp1d import Interp1D
    from ndarray_interp_tpu.interp1d.cubic_spline import (
        CubicSpline,
        CubicSplineStrategy,
    )

    dtype = jnp.float32
    x_d = jnp.asarray(knots, dtype)
    v_d = jnp.asarray(values, dtype)
    q_d = jnp.asarray(queries, dtype)

    # Build fully under jit (new_unchecked path): on the tunneled TPU every
    # eager op pays a relay round-trip, so the validating eager builder is
    # benchmarked-hostile even though the math is identical.
    strat = CubicSpline().extrapolate(True)

    @jax.jit
    def build_ab(x, v):
        s = strat.build(x, v)
        return s.a, s.b

    a, b = build_ab(x_d, v_d)
    interp = Interp1D.new_unchecked(
        x_d, v_d, CubicSplineStrategy(a, b, "yes")
    )

    def eval_chain(links):
        @jax.jit
        def run(t, q):
            acc = jnp.float32(0.0)
            x = q
            for _ in range(links):
                r = t(x)
                acc = acc + jnp.sum(r)
                # data dependence defeats CSE; the perturbation is far
                # below a knot spacing, so every link does identical work
                x = q + jnp.float32(1e-6) * r
            return acc

        return run

    t_ours = measure_chained(
        eval_chain, 4 if cheap else 16, interp, q_d,
        reps=2 if cheap else 6,
    )
    our_qps = n_q / t_ours

    # secondary: build time for a 10k-knot bank of 64 splines
    bank = jnp.asarray(rng.normal(size=(10_000, 64)).astype(np.float32))
    xb = jnp.asarray(np.linspace(0, 1, 10_000), dtype)

    def build_chain(links):
        @jax.jit
        def run(x, d):
            acc = jnp.float32(0.0)
            dd = d
            for _ in range(links):
                s = strat.build(x, dd)
                acc = acc + jnp.sum(s.a)
                dd = d + jnp.float32(1e-6) * s.a[:1]
            return acc

        return run

    t_build = measure_chained(
        build_chain, 2 if cheap else 8, xb, bank, reps=2 if cheap else 6
    )

    # secondary: EVAL on the same 10k-knot x 64 bank (the wide-bank
    # gather route, VERDICT r1 item 4) — 256k queries scaled to /1M
    from ndarray_interp_tpu.models.interp1d import Interp1D as _I1
    from ndarray_interp_tpu.models.strategies.cubic import (
        CubicSplineStrategy as _CSS,
    )

    sb = jax.jit(lambda x_, d_: (lambda s: (s.a, s.b))(strat.build(x_, d_)))
    ab10, bb10 = sb(xb, bank)
    itp10 = _I1.new_unchecked(xb, bank, _CSS(ab10, bb10, "yes"))
    nq10 = 262_144
    q10 = jnp.asarray(rng.uniform(0, 1, nq10).astype(np.float32))

    def bank_eval_chain(links):
        @jax.jit
        def run(t, q):
            acc = jnp.float32(0.0)
            qq = q
            for _ in range(links):
                r = t(qq)
                s = jnp.sum(r)
                acc = acc + s
                qq = q + jnp.float32(1e-30) * s
            return acc

        return run

    t_bank = measure_chained(
        bank_eval_chain, 2 if cheap else 8, itp10, q10,
        reps=2 if cheap else 6,
    )

    result = {
        "metric": "queries/sec/chip (1D cubic, 1M pts)",
        "value": round(our_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(our_qps / scipy_qps, 3),
        "extra": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "eval_ms_1M": round(t_ours * 1e3, 3),
            "scipy_cpu_qps": round(scipy_qps, 1),
            "scipy_cpu_qps_runs": [round(r, 1) for r in scipy_runs],
            "build_ms_10k_knot_x64_bank": round(t_build * 1e3, 3),
            "eval_ms_10k_knot_x64_bank_per_1M_q": round(
                t_bank * 1e3 * (1_000_000 / nq10), 3
            ),
            "dtype": "float32",
            **(
                {"note": "accelerator unreachable - CPU-backend fallback "
                         "measurement, not a TPU number"}
                if cheap else {}
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import os

    if os.environ.get("NDI_BENCH_CHILD"):
        sys.exit(main())
    sys.exit(_supervise())
