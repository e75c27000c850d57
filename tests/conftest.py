"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (for sharding tests)
and 64-bit mode enabled so the f64 value tables ported from the reference
(`/root/reference/tests/`) can be checked at full precision.
"""

import os
import sys
from pathlib import Path

# make the package importable regardless of the pytest invocation cwd
_ROOT = str(Path(__file__).resolve().parent.parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

def _is_tpu_run():
    """True when the invocation selects the on-TPU parity gate
    (``pytest -m tpu``): those tests need the real device, so the CPU
    forcing below must not apply."""
    return os.environ.get("NDI_TPU_TESTS", "") == "1"


# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (a tunneled
# TPU); running the f64 oracle tests there would be slow (every eager op
# becomes an RPC) and f64 is unsupported on TPU anyway.  The on-TPU
# parity gate (NDI_TPU_TESTS=1 pytest -m tpu) keeps the real device.
if not _is_tpu_run():
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: on-hardware parity tests (run via NDI_TPU_TESTS=1 pytest -m tpu)",
    )
    # The re-exec and x64 switch MUST run here (before collection):
    # test modules build jnp constants at import time, and collection
    # imports them — enabling x64 any later silently downgrades those
    # module-level value tables to f32 (caught as a 3e-7 oracle
    # mismatch in test_cubic_spline).
    _force_cpu_x64(config)
    config.addinivalue_line(
        "markers",
        "slow: long-running tests (multi-process cluster, 16M-knot "
        "capacity sweeps, big property tables).  CI runs everything; "
        "iterate locally with `pytest -m quick`.",
    )
    config.addinivalue_line(
        "markers",
        "quick: auto-applied to every test not marked slow/tpu "
        "(`pytest -m quick` is the fast local loop)",
    )


def _slow_list():
    path = Path(__file__).resolve().parent / "_slow_tests.txt"
    try:
        return {
            line.strip()
            for line in path.read_text().splitlines()
            if line.strip() and not line.startswith("#")
        }
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    slow = _slow_list()
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in slow and item.get_closest_marker("slow") is None:
            item.add_marker("slow")
        if item.get_closest_marker("slow") is None and (
            item.get_closest_marker("tpu") is None
        ):
            item.add_marker("quick")


def _force_cpu_x64(config):
    if _is_tpu_run():
        # real-device run: no CPU re-exec, no x64 (unsupported on TPU)
        return
    # The axon PJRT plugin registers itself in *every* interpreter via
    # sitecustomize (gated on PALLAS_AXON_POOL_IPS) and its relay session
    # adds ~30-50 ms of stall to every host transfer — a >100x slowdown
    # even on the CPU backend.  sitecustomize runs before pytest, so the
    # only clean escape is to re-exec pytest once with the trigger variable
    # removed.  Global capture must be stopped first so the child inherits
    # the real stdout instead of pytest's capture tempfile.
    if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
        "_NDI_TESTS_REEXEC"
    ):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["_NDI_TESTS_REEXEC"] = "1"
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        try:
            os.execve(
                sys.executable,
                [sys.executable, "-m", "pytest"] + sys.argv[1:],
                env,
            )
        except OSError:
            pass  # fall through: tests still run, just slowly

    import jax

    jax.config.update("jax_enable_x64", True)
