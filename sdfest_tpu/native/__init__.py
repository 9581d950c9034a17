"""Native C++ geometry kernels (built on demand, loaded via ctypes).

The reference ships its native code as a JIT-compiled torch extension
(/root/reference/sdfest/differentiable_renderer/sdf_renderer.py:22-28); this
module follows the same build-on-first-import convention with plain g++ and
ctypes — no pybind11 / torch build dependencies.

Exposed functions (see :mod:`sdfest_tpu.native.api` for numpy wrappers):
- ``voxelize_mesh``: triangle mesh -> signed distance grid.
- ``marching_tetrahedra``: isosurface triangle soup.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_SRC = os.path.join(os.path.dirname(__file__), "src", "sdfest_native.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "sdfest_native.so")

lib = None


def _build() -> None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
        _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global lib
    if lib is not None:
        return lib
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.voxelize_mesh.restype = ctypes.c_int
        lib.marching_tetrahedra.restype = ctypes.c_int
    except Exception as e:  # toolchain unavailable: callers fall back
        print(f"sdfest_tpu native build unavailable: {e}", file=sys.stderr)
        lib = None
    return lib


_load()
