"""Build the native host runtime shared library.

Usage: ``python -m ndarray_interp_tpu.native.build``

The library is a plain C++ shared object with an ``extern "C"`` ABI
(loaded via ctypes), so no Python headers or packaging steps are needed.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRC = HERE / "src" / "ndi_native.cpp"
OUT = HERE / "libndi_native.so"


def build(verbose: bool = True) -> Path:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-funroll-loops",
        # forbid FMA contraction so results match the XLA CPU path (and the
        # reference's scalar arithmetic) bit-for-bit
        "-ffp-contract=off",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-fopenmp",
        str(SRC),
        "-o",
        str(OUT),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
