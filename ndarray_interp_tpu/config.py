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
