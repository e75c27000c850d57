"""Runtime feature flags.

``use_fused_kernel``: route eligible 1-D evaluations (TPU backend, f32,
scalar trailing dims) through the fused Pallas kernel
(:mod:`ndarray_interp_tpu.ops.pallas_eval`).  Disable with
``NDI_TPU_DISABLE_FUSED=1`` or ``config.use_fused_kernel = False`` to fall
back to the pure-XLA path (useful for debugging or bit-exact comparison
against the XLA formulation).
"""

from __future__ import annotations

import os

#: NOTE: flags are consulted at trace time; flipping them does not
#: invalidate already-compiled jit caches.
use_fused_kernel: bool = os.environ.get("NDI_TPU_DISABLE_FUSED", "0") != "1"

#: Route eager scalar queries (``interp_scalar``) through the native C++
#: host runtime (``ndarray_interp_tpu/native``) when available.  Disable
#: with ``NDI_TPU_DISABLE_NATIVE=1``.
use_native_host: bool = os.environ.get("NDI_TPU_DISABLE_NATIVE", "0") != "1"

#: Largest per-cell packed Bicubic row table, in ELEMENTS (f32 elements =
#: 4 bytes each; default 128M elements = 512 MB).  The cell table stores
#: the 16-quantity corner state per cell — ~17x the grid data's memory
#: for scalar-ish trailing dims (e.g. 267 MB for a (512, 512, 16) f32
#: grid) — in exchange for ONE row gather per query.  Grids whose table
#: would exceed this cap build the memory-frugal node table instead
#: (~4x data memory, 4 corner gathers per query — ~3x slower eval on
#: v5e; see docs/API.md).
bicubic_pack_max_elems: int = 128 * 1024 * 1024

#: Compile-payload hygiene cap, in BYTES (default 8 MB): the serving
#: evaluators assert at warmup that their jitted programs embed less
#: than this much constant data (``utils/hygiene.py``).  A big device
#: table captured by CLOSURE (instead of passed as a jit argument) is
#: constant-folded into the program and shipped with every (remote)
#: compile — a 535 MB table measured 138 MB of program MLIR and wedged
#: the compile relay (docs/ROADMAP.md round-3 postmortem).  Override
#: with ``NDI_JIT_CONST_CAP_BYTES``.
jit_const_cap_bytes: int = int(
    os.environ.get("NDI_JIT_CONST_CAP_BYTES", 8 * 1024 * 1024)
)

#: Trace-time closure-capture guard at the raw route entry points
#: (``gathered_*`` / packed DF/f48/ND routes): calling a route under
#: jit/vmap/grad with a CONCRETE table bigger than
#: :data:`jit_const_cap_bytes` raises immediately instead of embedding
#: the table in the program (``utils/hygiene.py:check_route_tables``).
#: On by default — the check is trace-time-only and free at runtime;
#: set ``NDI_ROUTE_HYGIENE=0`` to disable.
route_hygiene: bool = os.environ.get("NDI_ROUTE_HYGIENE", "1") != "0"

#: Largest knot count for the dense-operator spline build on TPU.  For a
#: shared knot axis and a uniform boundary family the whole build map
#: ``data → (a, b)`` (assembly + tridiagonal solve + coefficient pass) is
#: LINEAR, so it can be probed once with an identity bank (an (n, n)
#: solve) and applied to the real bank as ONE ``Precision.HIGHEST``
#: matmul at stream-floor traffic — measured 4.8× faster than the PCR
#: route at the NS5b shape (64 knots × 1e6 bank: 20.5 → 4.3 ms on v5e)
#: and neutral at 256 knots.  Past this knot count the O(n²·bank) MXU
#: work overtakes PCR's O(n·log n·bank) streams (measured 0.7× at 2048),
#: so larger systems keep PCR.  CPU always keeps the reference-order
#: scan solver (bit-identical to ``cubic_spline.rs:678-721``).
dense_build_max_n: int = int(
    os.environ.get("NDI_DENSE_BUILD_MAX_N", 512)
)

#: Largest packed InterpND corner-row table, in ELEMENTS.  The table
#: stores all ``2^k`` cell corners contiguously per cell (``2^k``× the
#: grid data's memory) so linear evaluation is ONE row gather per query;
#: grids whose table would exceed this cap use the unpacked
#: ``2^k``-corner gather instead (``2^k`` row fetches per query — the
#: gather-engine law charges per fetched row, see docs/ROADMAP.md).
interpnd_pack_max_elems: int = 128 * 1024 * 1024
