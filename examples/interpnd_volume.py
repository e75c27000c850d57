"""N-D interpolation (`InterpND`): a 3-D volume served at fixed shapes.

The reference crate stops at two interpolated axes
(``/root/reference/src/interp2d/mod.rs:29-32``); `InterpND` covers the
leading-``k``-axes case with the SciPy ``RegularGridInterpolator``
surface — here a 64x48x32 volume with a vector payload per node,
trilinear and tensor-product tricubic, plus the bucketed serving
evaluator and a mixed partial.

Run on any backend:

    python examples/interpnd_volume.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from ndarray_interp_tpu.interpnd import InterpND
from ndarray_interp_tpu.serving import EvaluatorND

rng = np.random.default_rng(0)

# a rectilinear (non-uniform) 3-D grid with a 2-vector payload per node
axes = [
    np.sort(rng.uniform(0.0, 10.0, 64)),
    np.sort(rng.uniform(-5.0, 5.0, 48)),
    np.sort(rng.uniform(0.0, 1.0, 32)),
]
data = rng.normal(size=(64, 48, 32, 2))

# --- trilinear (one packed corner-row gather per query) -------------------
tri = InterpND.builder(data).points(*axes).build()
qs = [rng.uniform(a[0], a[-1], 100_000) for a in axes]
vals = tri.interp_array(*qs)  # (100000, 2): query dims lead, M + N - k
print("trilinear:", vals.shape, "first:", np.asarray(vals[0]))

# --- tensor-product tricubic (C^2; per-axis boundaries) -------------------
cub = (
    InterpND.builder(data)
    .points(*axes)
    .method("cubic")
    .boundary("not_a_knot", "natural", "clamped")
    .build()
)
vals_c = cub.interp_array(*qs)
print("tricubic: ", vals_c.shape, "first:", np.asarray(vals_c[0]))

# mixed partial d^2 f / dx dy, analytic
d = cub.derivative(*qs, orders=(1, 1, 0))
print("d2f/dxdy: ", d.shape, "first:", np.asarray(d[0]))

# --- jit / vmap / grad straight through (pytree) --------------------------
fast = jax.jit(lambda itp, a, b, c: itp(a, b, c))
_ = fast(cub, *(jnp.asarray(q) for q in qs))

# --- fixed-shape serving: no recompiles across batch sizes ----------------
ev = EvaluatorND(cub, max_batch=1 << 17).warmup()
for n in (17, 1000, 65_536):
    out = ev(*(q[:n] for q in qs))
    print(f"served {n:>6} queries -> {out.shape}")
